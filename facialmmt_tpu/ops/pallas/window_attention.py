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


# ----------------------------------------------------------------- kernel v2 --
#
# v1 loops windows serially inside the cell — each (49 x 49 x 32) dot still pays
# the MXU instance floor (~160 ns), so it barely beats XLA.  v2 merges G windows
# into ONE (G*N, G*N) matmul pair per head with a block-diagonal additive mask.
#
# MEASURED (v5e, 256-image swin-tiny batch, per stage, vs XLA einsum path):
#   stage0 (W=16384,h=3):  xla 25.1 ms   v2(G=4) 24.5 ms
#   stage1 (W=4096, h=6):  xla 13.8 ms   v2(G=4) 12.1 ms
#   stage2 (W=1024, h=12): xla  7.0 ms   v2(G=4)  7.2 ms
#   stage3 (W=256,  h=24): xla  4.3 ms   v2(G=4)  4.3 ms
# i.e. parity: tiny-window Swin attention is at this hardware's floor without
# hand-scheduled DMA pipelining.  Kept for future Mosaic work; the backbone
# defaults to the XLA path (SwinConfig / WindowAttention.fused = 'off').

def _make_kernel_v2(num_heads: int, num_bias_groups: int):
    # inputs arrive pre-merged as (1, h, G*N, hd) blocks: Mosaic cannot shape-
    # cast across the (G, N) sublane boundary in-kernel (N=49 is tile-unaligned),
    # so the merge happens in XLA outside the kernel.
    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        cell = pl.program_id(0)
        bias_idx = jax.lax.rem(cell, num_bias_groups)
        for head in range(num_heads):
            q = q_ref[0, head]                       # (G*N, hd)
            k = k_ref[0, head]
            v = v_ref[0, head]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            s = s + bias_ref[bias_idx, head]
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
            o_ref[0, head] = jnp.dot(
                p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return kernel


def _block_diag_bias(bias, g):
    """(nW, h, N, N) per-window bias -> (ceil(nW/g) [or 1], h, G*N, G*N)
    block-diagonal big-bias with -1e9 off-diagonal (cross-window) blocks.
    Traceable (bias derives from the relative-position-bias parameter)."""
    nw, h, n, _ = bias.shape
    groups = max(nw // g, 1)
    big = jnp.full((groups, h, g * n, g * n), -1e9, jnp.float32)
    for gr in range(groups):
        for i in range(g):
            wi = (gr * g + i) % nw
            big = big.at[gr, :, i * n:(i + 1) * n,
                         i * n:(i + 1) * n].set(bias[wi].astype(jnp.float32))
    return big


# ------------------------------------------------------------ paired kernel --
#
# v3: TWO windows per matmul pair, merged on the SUBLANE axis *inside* the
# kernel (jnp.concatenate on rows — no XLA-side merge transpose, the cost that
# sank the XLA-level pairing at 0.51x).  98 rows x 98 lanes stays inside one
# 128-lane tile (unlike v2's G=4 -> 196 lanes -> two tiles), so the instance
# count halves for 2x the (cheap) FLOPs: the MXU instance floor amortizes.
#
# MEASURED (v5e, 256-image swin-tiny stage widths, chained-jit harness,
# experiments/wattn_pair.py):
#   stage0 (W=16384,h=3):  xla lane-slice 17.6 ms   v3 14.7 ms   (1.20x)
#   stage1 (W=4096, h=6):  xla lane-slice  9.4 ms   v3  8.6 ms   (1.09x)
#   stage2 (W=1024, h=12): xla lane-slice  4.9 ms   v3  5.6 ms   (0.88x)
#   stage3 (W=256,  h=24): xla lane-slice  4.0 ms   v3  4.0 ms   (1.00x)
# -> profitable for the wide early stages only; WindowAttention's 'pair' mode
# uses it when num_heads <= 6 and falls back to lane-slice XLA otherwise.

def _make_kernel_v3(num_heads: int, groups: int, pairs: int):
    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        cell = pl.program_id(0)
        for p in range(pairs):
            bias_idx = jax.lax.rem(cell * pairs + p, groups)
            for head in range(num_heads):
                q2 = jnp.concatenate(
                    [q_ref[2 * p, head], q_ref[2 * p + 1, head]], axis=0)
                k2 = jnp.concatenate(
                    [k_ref[2 * p, head], k_ref[2 * p + 1, head]], axis=0)
                v2 = jnp.concatenate(
                    [v_ref[2 * p, head], v_ref[2 * p + 1, head]], axis=0)
                s = jnp.dot(q2, k2.T, preferred_element_type=jnp.float32)
                s = s + bias_ref[bias_idx, head]
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                pr = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v2.dtype)
                n = q_ref.shape[2]
                o2 = jnp.dot(pr, v2, preferred_element_type=jnp.float32
                             ).astype(o_ref.dtype)
                o_ref[2 * p, head] = o2[:n]
                o_ref[2 * p + 1, head] = o2[n:]
    return kernel


def _paired_impl(q, k, v, bias, pairs, interpret):
    w, h, n, hd = q.shape
    g = 2
    big = jnp.asarray(_block_diag_bias(bias, g), jnp.bfloat16)
    groups = big.shape[0]
    # VMEM budget: 4 operands, double-buffered, (49->64 sublane, 32->128 lane)
    # Mosaic padding
    per_pair = 4 * 2 * g * h * ((n + 15) // 16 * 16) * max(hd, 128) * 2
    while pairs > 1 and pairs * per_pair > 10 * 1024 * 1024:
        pairs //= 2
    while (w // g) % pairs != 0:
        pairs //= 2
    spec = pl.BlockSpec((g * pairs, h, n, hd), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel_v3(h, groups, pairs),
        grid=(w // (g * pairs),),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((groups, h, g * n, g * n),
                               lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((w, h, n, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, big)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def paired_window_attention(q, k, v, bias, pairs: int = 8,
                            interpret: bool = False):
    """Same contract as fused_window_attention (q PRE-SCALED, bias additive
    (nW, h, N, N) with window i using row i % nW); W must be even and, when
    nW > 1, nW must be even so pairs never straddle a bias boundary."""
    return _paired_impl(q, k, v, bias, pairs, interpret)


def _lane_slice_reference(q, k, v, bias):
    """Per-head formulation matching ops/swin.py's lane-slice path: same math
    as _reference, but XLA autodiff of THIS graph produces the faster
    backward (no (W, h, N, N) transpose materialization) — measured 531 vs
    509 img/s on the aux fwd+bwd step at Swin-tiny shapes."""
    w, h, n, hd = q.shape
    nw = bias.shape[0]
    outs = []
    for head in range(h):
        s = jnp.einsum("bnd,bmd->bnm", q[:, head], k[:, head],
                       preferred_element_type=jnp.float32)
        s = s.reshape(w // nw, nw, n, n) + bias[:, head][None]
        p = jax.nn.softmax(s.reshape(w, n, n), axis=-1).astype(v.dtype)
        outs.append(jnp.einsum("bnm,bmd->bnd", p, v[:, head]))
    return jnp.stack(outs, axis=1)


def _paired_fwd(q, k, v, bias, pairs, interpret):
    return _paired_impl(q, k, v, bias, pairs, interpret), (q, k, v, bias)


def _paired_bwd(pairs, interpret, res, grad):
    q, k, v, bias = res
    _, vjp = jax.vjp(_lane_slice_reference, q, k, v, bias)
    return vjp(grad)


paired_window_attention.defvjp(_paired_fwd, _paired_bwd)


def fused_window_attention_v2(q, k, v, bias, group: int = 4,
                              interpret: bool = False):
    """Block-diagonal grouped window attention.  Same contract as
    fused_window_attention; `group` windows merge into one matmul pair.
    Requires (W % group == 0) and (nW % group == 0 or nW == 1)."""
    w, h, n, hd = q.shape
    nw = bias.shape[0]
    g = group
    while w % g != 0 or (nw > 1 and nw % g != 0):
        g -= 1
    big_bias = jnp.asarray(_block_diag_bias(bias, g), jnp.bfloat16)
    groups = big_bias.shape[0]

    def merge(x):
        # (W, h, N, hd) -> (W/G, h, G*N, hd)
        return x.reshape(w // g, g, h, n, hd).transpose(0, 2, 1, 3, 4).reshape(
            w // g, h, g * n, hd)

    grid = (w // g,)
    spec = pl.BlockSpec((1, h, g * n, hd), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel_v2(h, groups),
        grid=grid,
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((groups, h, g * n, g * n),
                               lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((w // g, h, g * n, hd), q.dtype),
        interpret=interpret,
    )(merge(q), merge(k), merge(v), big_bias)
    return out.reshape(w // g, h, g, n, hd).transpose(0, 2, 1, 3, 4).reshape(
        w, h, n, hd)
