"""Fused multi-head attention Pallas kernel (TPU).

Used by the text tower (RoBERTa/BERT over the 512-token dialogue) — the
framework's dominant FLOPs consumer.  XLA's default lowering materializes the
(B, H, S, S) probability tensor in HBM between the two attention matmuls; this
kernel keeps scores/probs entirely in VMEM per (batch, head) grid cell:

    grid = (B, H); per cell:  scores = q @ k^T  (fp32, MXU)
                              probs  = softmax(scores + bias)  (VPU, fp32)
                              out    = probs @ v  (MXU)

For S=512, D=64 the fp32 score block is 1 MB — comfortably inside the ~16 MB
VMEM budget, so no streaming (flash-style K-blocking) is needed at this model's
shapes; sequences beyond ~1.5k tokens should switch to a blocked variant.

The backward pass recomputes attention with plain XLA ops via jax.custom_vjp —
standard recompute-in-bwd pattern (kernel saves HBM on fwd; bwd stays
XLA-fused).  Numerics match the unfused path to bf16 tolerance
(tests/test_pallas.py).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """One (batch, head) cell: q (S, D), k (S, D), v (S, D), bias (1, S)."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    scores = scores + bias_ref[0].astype(jnp.float32)  # (1, S) broadcasts rows
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = (e / denom).astype(v.dtype)
    o_ref[0, 0] = jnp.dot(probs, v, preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


def _fused_attention_fwd_impl(q, k, v, bias, *, interpret=False):
    """q, k, v: (B, H, S, D) — q pre-scaled; bias: (B, S) additive (padding)."""
    b, h, s, d = q.shape

    grid = (b, h)
    out = pl.pallas_call(
        _attention_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        interpret=interpret,
    )(q.reshape(b, h, s, d), k.reshape(b, h, s, d), v.reshape(b, h, s, d),
      bias.reshape(b, 1, s))
    return out


def _reference_attention(q, k, v, bias):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores + bias[:, None, None, :].astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(q, k, v, bias, interpret=False):
    """Fused attention: q (B, H, S, D) PRE-SCALED, k/v (B, H, S, D),
    bias (B, S) additive padding bias.  Returns (B, H, S, D)."""
    return _fused_attention_fwd_impl(q, k, v, bias, interpret=interpret)


def _fwd(q, k, v, bias, interpret):
    return _fused_attention_fwd_impl(q, k, v, bias, interpret=interpret), \
        (q, k, v, bias)


def _bwd(interpret, res, g):
    q, k, v, bias = res
    # recompute-through-XLA backward (standard flash-attn bwd pattern)
    _, vjp = jax.vjp(lambda q, k, v, bias: _reference_attention(q, k, v, bias),
                     q, k, v, bias)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)
