"""Fused multi-head attention Pallas kernel (TPU).

Used by the text tower (RoBERTa/BERT over the 512-token dialogue) — the
framework's dominant FLOPs consumer — and by the fusion stack (the audio /
vision self-attention towers, ops/encoder.py, and the crossmodal MulT stacks,
ops/crossmodal.py; reference modules/multihead_attention.py:100-140 computes
the same math with a materialized (B*H, Sq, Sk) score tensor).  XLA's default
lowering materializes the (B, H, Sq, Sk) probability tensor in HBM between the
two attention matmuls; this kernel keeps scores/probs entirely in VMEM per
(batch, head) grid cell:

    grid = (B, H); per cell:  scores = q @ k^T  (fp32, MXU)
                              probs  = softmax(scores + bias)  (VPU, fp32)
                              out    = probs @ v  (MXU)

Cross-attention (Sq != Sk) is supported: the per-cell blocks are q (Sq, D),
k/v (Sk, D), bias (1, Sk) — nothing in the cell body assumes square scores.

For S=512, D=64 the fp32 score block is 1 MB — comfortably inside the ~16 MB
VMEM budget, so no streaming (flash-style K-blocking) is needed at this model's
shapes; sequences beyond ~1.5k tokens should switch to a blocked variant.

Measured applicability (v5e, experiments/fusion_attn_tpu_check.py): the kernel
WINS at text-tower scale (S=512: 0.94 vs 1.54 ms) but LOSES at the fusion
shapes — audio tower S=157 (5L, batch 128): 20.95 -> 25.07 ms (0.84x), vision
S=32 (2L): 3.03 -> 4.09 ms (0.74x), crossmodal T38xA157: 4.75 -> 6.25 ms
(0.76x).  Cause: those towers are matmul-bound at ~67 TFLOP/s (near the
measured 80 TFLOP/s ceiling), the (B, H, S, S) probs HBM round-trip the kernel
avoids is <1 ms there, and per-(b, h) blocks with S < 256 / D=64 waste MXU
lanes (157 pads to 256; D=64 is half a 128-lane tile).  Callers therefore
shape-gate 'auto' at Sk >= 256 (ops/encoder.py, ops/crossmodal.py).

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
    """One (batch, head) cell: q (Sq, D), k (Sk, D), v (Sk, D), bias (1, Sk)."""
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
    """q: (B, H, Sq, D) — pre-scaled; k, v: (B, H, Sk, D);
    bias: (B, Sk) additive (padding), broadcast over queries."""
    b, h, sq, d = q.shape
    sk = k.shape[2]

    grid = (b, h)
    out = pl.pallas_call(
        _attention_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, sq, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, sq, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias.reshape(b, 1, sk))
    return out


def _reference_attention(q, k, v, bias):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores + bias[:, None, None, :].astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(q, k, v, bias, interpret=False):
    """Fused attention: q (B, H, Sq, D) PRE-SCALED, k/v (B, H, Sk, D),
    bias (B, Sk) additive padding bias.  Returns (B, H, Sq, D)."""
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
