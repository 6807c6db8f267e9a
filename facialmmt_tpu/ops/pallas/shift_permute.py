"""Pallas shifted-window permutation: the SW-MSA cyclic shift as one
bandwidth-floor kernel.

SwinBlock realizes the reference's roll -> re-partition (reference
Swin_Transformer.py:233-257) as a static row gather in window layout
(ops/swin.py::shifted_window_perms).  XLA lowers that `jnp.take` as a
row-granular gather at (1, C) granularity — measured ~4x the HBM bandwidth
floor (experiments/block_gap.py: perm+inverse 3.15 ms at stage-0/256-face
shapes, vs ~0.8 ms of raw bytes).  This kernel exploits the permutation's
window structure instead: each target window is an assembly of static slices
from exactly FOUR source windows of the same image (the 2x2 window
neighborhood the cyclic shift straddles), so the grid runs one cell per
image, DMAs the image's windows into VMEM once, and emits each target window
as 3 concats / 8 static slices in a (ws, ws, C)-tiled view.  Reads and
writes each element exactly once.

MEASURED AND REJECTED (v5e, perm+inverse round trip per shifted block,
experiments/shift_perm_bench.py, 256 faces; take baseline same harness):
    stage0 (56, C=96):  0.58-0.65x the jnp.take path
    stage1 (28, C=192): 0.72-0.84x
    stage2 (14, C=384): 0.89-0.97x
Two kernel structures tried (flat (N, C) rows with 14 sublane slices per
window; (ws, ws, C) tiles with 3 concats per window) — both lose.  Root
cause: at (7, 96) window granularity the data moves through VMEM as padded
(8, 128) vector registers, so ANY in-VMEM permute costs ~900+ vector ops per
image — and XLA's row gather already runs at that issue-rate floor.  The
remaining idea (assembling shifted windows INSIDE fused_attention_block,
where the window loads are already paid) prices out neutral-to-worse: the
assembly shuffles (~2.3 ms/stage0-block standalone) exceed the ~2.6 ms the
two deleted takes cost, minus any Mosaic VPU/MXU overlap.  Kept as the
measured-negative record with exact parity tests; default OFF everywhere
(SwinBlock keeps jnp.take).

The mapping (window ws, shift s, window grid nw_h x nw_w; forward = the
pre-attention shift, i.e. rolled(i,j) = orig(i+s, j+s)):

    target (wi, wj, r, cc)  <-  source ((wi + (r+s)//ws) % nw_h,
                                        (wj + (cc+s)//ws) % nw_w,
                                        (r+s) % ws, (cc+s) % ws)

and the INVERSE permutation is the same template with s' = ws - s and both
window indices offset by -1 — one kernel body serves both directions.

A permutation's vjp is its inverse permutation, so `shift_permute` carries a
custom_vjp that runs the opposite-direction kernel: the op is EXACT (pure
data movement, any dtype) and safe on every path, including the grad-bearing
aux/joint training forwards.  Non-TPU backends fall back to the jnp.take
formulation; tests pin bitwise equality between the two.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(nw_h: int, nw_w: int, ws: int, s_eff: int, da_r: int,
                 da_c: int, unroll: bool):
    def assemble(x_ref, o_ref, t, band_a, band_b, col_a, col_b):
        w00 = x_ref[band_a * nw_w + col_a]     # top-left    (ws, ws, c)
        w01 = x_ref[band_a * nw_w + col_b]     # top-right
        w10 = x_ref[band_b * nw_w + col_a]     # bottom-left
        w11 = x_ref[band_b * nw_w + col_b]     # bottom-right
        s = s_eff
        # target rows r < ws-s come from source rows [s, ws) of the top band,
        # the rest from rows [0, s) of the bottom band; same split on columns.
        # Axis 0 is tile-granular, axis 1 a static sublane slice — 3 concats
        # and 8 slices per window, no 49-row flattening in-kernel.
        top = jnp.concatenate([w00[s:, s:], w01[s:, :s]], axis=1)
        bot = jnp.concatenate([w10[:s, s:], w11[:s, :s]], axis=1)
        o_ref[t] = jnp.concatenate([top, bot], axis=0)

    def kernel(x_ref, o_ref):
        if unroll:
            for t in range(nw_h * nw_w):
                wi, wj = t // nw_w, t % nw_w
                assemble(x_ref, o_ref, t,
                         (wi + da_r) % nw_h, (wi + da_r + 1) % nw_h,
                         (wj + da_c) % nw_w, (wj + da_c + 1) % nw_w)
        else:
            def body(t, carry):
                wi = t // nw_w
                wj = jax.lax.rem(t, nw_w)
                assemble(x_ref, o_ref, t,
                         jax.lax.rem(wi + da_r, nw_h),
                         jax.lax.rem(wi + da_r + 1, nw_h),
                         jax.lax.rem(wj + da_c, nw_w),
                         jax.lax.rem(wj + da_c + 1, nw_w))
                return carry

            jax.lax.fori_loop(0, nw_h * nw_w, body, 0)

    return kernel


def _impl(x, h, w, ws, shift, inverse, interpret, unroll=True):
    b, l, c = x.shape
    nw_h, nw_w = h // ws, w // ws
    nw = nw_h * nw_w
    s_eff = (ws - shift) if inverse else shift
    da_r = (nw_h - 1) if inverse else 0
    da_c = (nw_w - 1) if inverse else 0
    xw = x.reshape(b * nw, ws, ws, c)
    blk = pl.BlockSpec((nw, ws, ws, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(nw_h, nw_w, ws, s_eff, da_r, da_c, unroll),
        grid=(b,),
        in_specs=[blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b * nw, ws, ws, c), x.dtype),
        interpret=interpret,
    )(xw)
    return out.reshape(b, l, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def shift_permute(x, h: int, w: int, ws: int, shift: int,
                  inverse: bool = False, interpret: bool = False):
    """Apply the shifted-window permutation (or its inverse) to window-resident
    tokens.  x: (B, H*W, C) in window layout; returns the same shape.
    Equivalent to `jnp.take(x, perm_or_inv, axis=1)` with
    ops/swin.py::shifted_window_perms(h, w, ws, shift) — bitwise, any dtype."""
    return _impl(x, h, w, ws, shift, inverse, interpret)


def _fwd(x, h, w, ws, shift, inverse, interpret):
    return _impl(x, h, w, ws, shift, inverse, interpret), None


def _bwd(h, w, ws, shift, inverse, interpret, _, g):
    # vjp of a permutation = the inverse permutation of the cotangent
    return (_impl(g, h, w, ws, shift, not inverse, interpret),)


shift_permute.defvjp(_fwd, _bwd)


def shift_permute_ok(h: int, w: int, ws: int, shift: int) -> bool:
    """Shape gate: the kernel assumes an exact window grid and a genuine
    2x2-neighborhood shift (0 < shift < ws) with at least a 2-window grid."""
    return (0 < shift < ws and h % ws == 0 and w % ws == 0
            and h // ws >= 2 and w // ws >= 2)
