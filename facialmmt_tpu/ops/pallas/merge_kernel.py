"""Fused LN -> (4C -> 2C) reduction Pallas kernel for Swin patch merging.

Candidate for the stage-transition plumbing slice (reference
Swin_Transformer.py:291-328 does concat -> LayerNorm -> Linear(4C->2C,
no bias)); the 2x2 concat gather itself stays an XLA jnp.take — the
shift_permute record showed XLA's row gathers already run at the VMEM
issue-rate floor at these granularities (ops/pallas/shift_permute.py).

This kernel covers only the LN+matmul tail: LN stats fp32 in VMEM, weight
resident, one pass over HBM (read gathered x, write reduced out) instead of
XLA's possible LN materialization.  Forward/eval only (custom_vjp recomputes
through plain XLA for the backward, same policy as block_mlp.py).

Measured (experiments/merge_bench.py) — see docstring updates after the run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, g_ref, b_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)                      # (tile, 4C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = jnp.dot(xn.astype(jnp.bfloat16), w_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _tile_for(c_in: int, t: int) -> int:
    budget = 6 * 1024 * 1024
    per_token = (c_in * 2 + c_in * 4 + c_in) * 2  # x bf16 + fp32 norm + out
    tile = budget // per_token
    for cand in (2048, 1024, 512, 256, 128):
        if cand <= tile:
            tile = cand
            break
    else:
        tile = 128
    while t % tile != 0:
        tile //= 2
    return max(tile, 1)


def _fwd_impl(x, gamma, beta, w, eps, interpret):
    b, l, c4 = x.shape
    c2 = w.shape[1]
    t = b * l
    x2 = x.reshape(t, c4)
    tile = _tile_for(c4, t)
    if tile < 128:
        tile = 128
        pad = (-t) % tile
        xp = jnp.pad(x2, ((0, pad), (0, 0)))
        out = _flat_call(xp, gamma, beta, w, eps, interpret, tile)
        return out[:t].reshape(b, l, c2)
    return _flat_call(x2, gamma, beta, w, eps, interpret,
                      tile).reshape(b, l, c2)


def _flat_call(x2, gamma, beta, w, eps, interpret, tile):
    t, c4 = x2.shape
    c2 = w.shape[1]
    grid = (t // tile,)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec(c4), vec(c4),
            pl.BlockSpec((c4, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c2), x2.dtype),
        interpret=interpret,
    )(x2, gamma.reshape(1, c4), beta.reshape(1, c4), w.astype(jnp.bfloat16))


def _reference(x, gamma, beta, w, eps=1e-5):
    """Same math/precision as the kernel: LN stats fp32, bf16 matmul."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * gamma + beta
    return jnp.dot(xn.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_merge(x, gamma, beta, w, eps=1e-5, interpret=False):
    """x: (B, L, 4C) gathered merge rows; gamma/beta: (4C,); w: (4C, 2C).
    Returns (B, L, 2C) = LN(x) @ w."""
    return _fwd_impl(x, gamma, beta, w, eps, interpret)


def _fwd(x, gamma, beta, w, eps, interpret):
    return _fwd_impl(x, gamma, beta, w, eps, interpret), (x, gamma, beta, w)


def _bwd(eps, interpret, res, g):
    x, gamma, beta, w = res
    _, vjp = jax.vjp(lambda x, ga, be, w: _reference(x, ga, be, w, eps),
                     x, gamma, beta, w)
    return vjp(g)


fused_merge.defvjp(_fwd, _bwd)
