"""Fused Swin window-attention Pallas kernel.

Swin-tiny's hot loop is tens of thousands of tiny (49 x 49 x 32) attention
matmuls per image batch — a shape XLA executes at ~2 TFLOP/s on TPU because
each batched-matmul instance underfills the MXU and the (W, h, 49, 49) score
tensor round-trips HBM between the two matmuls and the softmax.

This kernel processes a GROUP of windows per grid cell entirely in VMEM:

    grid = (W / G,);  per cell, for each window g and head:
        s = q @ k^T            (MXU, fp32 accum, stays in VMEM)
        p = softmax(s + bias)  (VPU, fp32)
        o = p @ v              (MXU)

bias is the precomputed (nW, h, N, N) combination of the relative-position
bias and the shifted-window mask (reference Swin_Transformer.py:126-135);
window index wi selects row wi % nW.  No score tensor ever touches HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(g_windows: int, num_heads: int, nw: int):
    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        cell = pl.program_id(0)

        def body(g, _):
            wi = cell * g_windows + g
            bias_idx = jax.lax.rem(wi, nw)
            for head in range(num_heads):
                q = q_ref[g, head]                      # (N, hd)
                k = k_ref[g, head]
                v = v_ref[g, head]
                s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
                s = s + bias_ref[bias_idx, head]
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
                o_ref[g, head] = jnp.dot(
                    p, v, preferred_element_type=jnp.float32
                ).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, g_windows, body, 0)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_window_attention(q, k, v, bias, group: int = 0,
                           interpret: bool = False):
    """q, k, v: (W, h, N, hd) with q PRE-SCALED; bias: (nW, h, N, N) additive
    (relative-position bias + shifted-window mask), W % nW == 0.
    Returns (W, h, N, hd)."""
    return _fwd_impl(q, k, v, bias, group, interpret)


def _padded_bytes(g, h, n, hd, itemsize):
    # Mosaic tiling: last dim pads to 128 lanes, second-minor to 16 sublanes (bf16)
    n_p = (n + 15) // 16 * 16
    hd_p = max(hd, 128)
    return g * h * n_p * hd_p * itemsize


def _auto_group(w, h, n, hd, nw, budget_bytes=10 * 1024 * 1024):
    """Largest group size whose double-buffered q/k/v/o blocks + bias fit VMEM."""
    n_p = (n + 15) // 16 * 16
    bias_bytes = nw * h * n_p * 128 * 2 * 2  # bf16, double-buffered
    for g in range(min(w, 64), 0, -1):
        if w % g != 0:
            continue
        blocks = 4 * 2 * _padded_bytes(g, h, n, hd, 2)  # q,k,v,o double-buffered
        if blocks + bias_bytes <= budget_bytes:
            return g
    return 1


def _fwd_impl(q, k, v, bias, group, interpret):
    w, h, n, hd = q.shape
    nw = bias.shape[0]
    g = group if group > 0 else _auto_group(w, h, n, hd, nw)
    g = min(g, w)
    while w % g != 0:
        g -= 1
    grid = (w // g,)
    spec = pl.BlockSpec((g, h, n, hd), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(g, h, nw),
        grid=grid,
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((nw, h, n, n), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((w, h, n, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, bias.astype(jnp.bfloat16))


def _reference(q, k, v, bias):
    w = q.shape[0]
    nw = bias.shape[0]
    s = jnp.einsum("whnd,whmd->whnm", q, k,
                   preferred_element_type=jnp.float32)
    tiled = jnp.tile(bias, (w // nw, 1, 1, 1))
    p = jax.nn.softmax(s + tiled, axis=-1).astype(v.dtype)
    return jnp.einsum("whnm,whmd->whnd", p, v)


def _fwd(q, k, v, bias, group, interpret):
    return _fwd_impl(q, k, v, bias, group, interpret), (q, k, v, bias)


def _bwd(group, interpret, res, grad):
    q, k, v, bias = res
    _, vjp = jax.vjp(_reference, q, k, v, bias)
    return vjp(grad)


fused_window_attention.defvjp(_fwd, _bwd)
