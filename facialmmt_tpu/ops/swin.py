"""Swin-tiny backbone, TPU-native.

Rebuild of the reference's Swin Transformer FER backbone
(reference modules/SwinTransformer/Swin_Transformer.py:33-541, configured by
swin_conf.yaml: tiny, depths (2,2,6,2), heads (3,6,12,24), window 7, drop_path 0.3).

TPU-first design notes:
  * window partition / reverse are pure reshape+transpose (layout ops XLA folds
    into the surrounding fusions); the cyclic shift is jnp.roll;
  * the shifted-window attention mask and the relative-position index are
    compile-time numpy constants — zero device work;
  * attention runs as batched einsums over (num_windows*B, 49, C) with
    fp32 accumulation on the MXU; a fused Pallas window-attention kernel can be
    swapped in via `attention_impl` (ops/pallas/window_attention.py);
  * stochastic depth (DropPath) uses one bernoulli per sample per block;
  * the head is LN -> flatten(49*768) -> Linear(512) -> BatchNorm1d, as the
    reference's output_layer (Swin_Transformer.py:491-494).  The reference's
    batch-of-1 duplication workaround (:533-541) exists only because torch
    BatchNorm1d cannot take batch-1 in train mode; duplicating the row gives
    batch stats with var=0, which is what flax computes natively for batch 1, so
    no workaround is needed (eval mode uses running stats either way).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from facialmmt_tpu.config import SwinConfig
from facialmmt_tpu.ops.layers import TorchLinear

Dtype = Any

# Swin re-initializes every Linear with trunc_normal(std=0.02) + zero bias
# (reference Swin_Transformer.py:498-505)
_SWIN_KERNEL_INIT = nn.initializers.truncated_normal(0.02)
_SWIN_BIAS_INIT = nn.initializers.zeros


def SwinLinear(features, use_bias=True, dtype=None, name=None):
    return TorchLinear(features, use_bias=use_bias, dtype=dtype, name=name,
                       kernel_init=_SWIN_KERNEL_INIT, bias_init=_SWIN_BIAS_INIT)


def relative_position_index(window_size: int) -> np.ndarray:
    """(Wh*Ww, Wh*Ww) indices into the (2W-1)^2 relative-position-bias table
    (reference Swin_Transformer.py:92-103)."""
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]          # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shifted_window_mask(h: int, w: int, window_size: int,
                        shift: int) -> np.ndarray:
    """(num_windows, N, N) additive mask (-100 on cross-region pairs) for SW-MSA
    (reference Swin_Transformer.py:208-231)."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -window_size), slice(-window_size, -shift),
               slice(-shift, None)):
        for ws_ in (slice(0, -window_size), slice(-window_size, -shift),
                    slice(-shift, None)):
            img[hs, ws_] = cnt
            cnt += 1
    win = img.reshape(h // window_size, window_size,
                      w // window_size, window_size)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _window_layout_index(h: int, w: int, ws: int) -> np.ndarray:
    """(H, W) grid position -> flat index in window layout (w*N + n)."""
    i, j = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    win = (i // ws) * (w // ws) + (j // ws)
    pos = (i % ws) * ws + (j % ws)
    return win * (ws * ws) + pos


def merge_gather_index(sh: int, sw: int, ws_s: int, ws_n: int) -> np.ndarray:
    """Static row map for window-resident patch merging: output row j of the
    NEXT stage's window-resident (L/4, 4C) merge layout pulls rows
    [g0, g1, g2, g3] of the CURRENT stage's window-resident layout, in the
    reference's x0/x1/x2/x3 channel-concat order
    (reference Swin_Transformer.py:291-328).  Lets the stage transition run
    as ONE jnp.take instead of window_reverse + strided slices +
    window_partition (three transpose/copy chains) — see SwinConfig.merge_impl
    for the measured numbers."""
    nh, nw = sh // 2, sw // 2
    cur = _window_layout_index(sh, sw, ws_s).flatten()   # raster -> wr row
    nxt = _window_layout_index(nh, nw, ws_n).flatten()   # merged raster -> wr
    raster_of_next = np.empty(nh * nw, np.int64)
    raster_of_next[nxt] = np.arange(nh * nw)             # wr row -> raster
    out = np.empty((nh * nw, 4), np.int32)
    rows, cols = np.divmod(raster_of_next, nw)
    # concat order x0=(0,0), x1=(1,0), x2=(0,1), x3=(1,1)
    for t, (dr, dc) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        out[:, t] = cur[(2 * rows + dr) * sw + (2 * cols + dc)]
    return out


def shifted_window_perms(h: int, w: int, ws: int,
                         shift: int) -> tuple[np.ndarray, np.ndarray]:
    """Static permutations realizing cyclic-shift + re-partition entirely in
    window layout.

    The reference implements SW-MSA as roll(-s) -> window partition -> attn ->
    reverse -> roll(+s) (reference Swin_Transformer.py:233-257).  All of that
    is data movement: for tokens already in window layout (nW*N, C), the
    pre-attention step is one row gather `x[perm]` and the post-attention step
    its inverse `y[inv]`.  Eliminates two rolls and two reshape/transpose
    round-trips per shifted block — and lets every block run window-resident
    (the partition happens once per stage, ops/swin.py SwinTransformer).
    """
    base = _window_layout_index(h, w, ws)            # grid -> window-flat
    # roll by -s: shifted grid (i, j) reads original grid ((i+s)%H, (j+s)%W)
    i, j = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    src = base[(i + shift) % h, (j + shift) % w]
    perm = np.zeros(h * w, np.int32)
    perm[base] = src                                 # x_shifted = x[perm]
    inv = np.zeros_like(perm)
    inv[perm] = np.arange(h * w, dtype=np.int32)     # x = x_shifted[inv]
    return perm, inv


def _fused_block_backend_ok() -> bool:
    """The mega-fused block kernel engages on TPU only (CPU parity tests pin
    the XLA path); tests monkeypatch this to force the interpret-mode kernel."""
    return jax.default_backend() == "tpu"


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics: scale by 1/keep_prob)."""

    rate: float

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference Swin_Transformer.py:65-144)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    # Pallas fused window attention (ops/pallas/window_attention.py): wins
    # ~20% on isolated stage-0 shapes but measured net-slower inside the full
    # backbone (serial per-window loop pipelines worse than XLA's batched
    # matmul) — default off; kept for shapes/backends where it wins.
    fused: str = "off"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        """x: (B_, N, C) with N = window_size^2; mask: (nW, N, N) additive or None."""
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh

        qkv = SwinLinear(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="qkv")(x)

        scale = hd ** -0.5
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, nh), jnp.float32)
        idx = jnp.asarray(relative_position_index(self.window_size))
        bias = table[idx.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)

        # 'pair' = paired-window Pallas kernel (two windows per matmul pair,
        # halves the MXU instance count — measured 1.2x/1.09x on the wide
        # stage0/1 widths, see ops/pallas/window_attention.py); profitable for
        # nh <= 6 only, and needs even window counts so pairs never straddle
        # a bias row.  'auto' resolves to it on TPU at those widths.
        nw_m = 1 if mask is None else mask.shape[0]
        pair_ok = (b_ % 2 == 0 and (nw_m == 1 or nw_m % 2 == 0)
                   and (deterministic or self.attn_drop == 0.0))
        use_pair = pair_ok and (
            self.fused == "pair"
            or (self.fused == "auto" and nh <= 6
                and jax.default_backend() == "tpu"))
        if use_pair:
            from facialmmt_tpu.ops.pallas.window_attention import \
                paired_window_attention

            qh = qkv[..., :c].reshape(b_, n, nh, hd)
            kh = qkv[..., c:2 * c].reshape(b_, n, nh, hd)
            vh = qkv[..., 2 * c:].reshape(b_, n, nh, hd)
            if mask is not None:
                full_bias = bias[None] + mask.astype(jnp.float32)[:, None]
            else:
                full_bias = bias[None]
            out = paired_window_attention(
                (qh * scale).transpose(0, 2, 1, 3),
                kh.transpose(0, 2, 1, 3), vh.transpose(0, 2, 1, 3), full_bias)
            out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
            out = SwinLinear(c, dtype=self.dtype, name="proj")(out)
            return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        # 'on' = serial v1 kernel (measured XLA-parity; kept for shapes or
        # backends where it wins); 'auto' with nh > 6 stays on the lane-slice
        # XLA path — the measured best at the narrow stage widths.
        use_fused = self.fused == "on"
        if use_fused and (deterministic or self.attn_drop == 0.0):
            # combined (nW, h, N, N) additive bias for the Pallas kernel
            from facialmmt_tpu.ops.pallas.window_attention import \
                fused_window_attention

            qh = qkv[..., :c].reshape(b_, n, nh, hd)
            kh = qkv[..., c:2 * c].reshape(b_, n, nh, hd)
            vh = qkv[..., 2 * c:].reshape(b_, n, nh, hd)
            if mask is not None:
                full_bias = bias[None] + mask.astype(jnp.float32)[:, None]
            else:
                full_bias = bias[None]
            out = fused_window_attention(
                (qh * scale).transpose(0, 2, 1, 3),
                kh.transpose(0, 2, 1, 3), vh.transpose(0, 2, 1, 3), full_bias)
            out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        else:
            # per-head LANE-SLICE attention: heads stay packed on the channel
            # axis and each head's q/k/v is a static lane slice of the packed
            # qkv output, so XLA never materializes the (b, h, n, d) transpose
            # the einsum formulation needs.  Measured on v5e @ 256-image
            # swin-tiny vs the einsum path (attention subgraph, per block):
            # stage0 15.2->11.6 ms, stage1 7.6->5.7, stage2 4.2->2.0.
            # fp32 score accumulation kept (reference-closest numerics; bf16
            # scores measured only ~8% faster and cost parity headroom).
            drop = nn.Dropout(self.attn_drop)
            outs = []
            for head in range(nh):
                q = qkv[..., head * hd:(head + 1) * hd]
                k = qkv[..., c + head * hd:c + (head + 1) * hd]
                v = qkv[..., 2 * c + head * hd:2 * c + (head + 1) * hd]
                s = jnp.einsum("bnd,bmd->bnm", q * scale, k,
                               preferred_element_type=jnp.float32)
                s = s + bias[head][None]
                if mask is not None:
                    nw = mask.shape[0]
                    s = s.reshape(b_ // nw, nw, n, n)
                    s = s + mask.astype(s.dtype)[None]
                    s = s.reshape(b_, n, n)
                p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
                p = drop(p, deterministic=deterministic)
                outs.append(jnp.einsum("bnm,bmd->bnd", p, v))
            out = jnp.concatenate(outs, axis=-1)
        out = SwinLinear(c, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class SwinBlock(nn.Module):
    """One (S)W-MSA + MLP block (reference Swin_Transformer.py:163-270).

    WINDOW-RESIDENT: input/output are (B, H*W, C) in *window layout* — tokens
    ordered (window, position-in-window), produced once per stage by
    SwinTransformer.  LN/MLP are per-token (layout-agnostic); the reference's
    roll -> partition -> attn -> reverse -> roll-back chain collapses to one
    static row-gather before attention and its inverse after
    (shifted_window_perms).  Non-shifted blocks need zero layout ops.
    Measured on v5e (256-image swin-tiny): the grid-layout round-trip cost
    ~2 ms/block; this removes it.
    """

    dim: int
    input_resolution: tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    fused_attention: str = "off"   # WindowAttention.fused
    fused_mlp: str = "off"         # 'off' | 'on' | 'auto' — Pallas LN+MLP+res
    dtype: Optional[Dtype] = None

    def _drop_path_keep(self, b: int, deterministic: bool):
        """Per-image stochastic-depth multiplier for the fused kernels (timm
        DropPath semantics: 0 with prob rate, else 1/keep_prob); None when
        drop-path is identity.  Drawn from the same 'dropout' stream the XLA
        DropPath uses (different rng fold -> different sample, same
        distribution — stochastic depth is a fresh draw per step either way,
        see docs/PARITY.md)."""
        if deterministic or self.drop_path == 0.0:
            return None
        keep_prob = 1.0 - self.drop_path
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep_prob,
                                    (b,))
        return jnp.where(mask, 1.0 / keep_prob, 0.0).astype(jnp.float32)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # `deterministic` is positional so nn.remat can mark it static
        h, w = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0     # whole-input window (reference :192-195)
        b, l, c = x.shape
        n = ws * ws

        shortcut = x
        ln1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        dp = DropPath(self.drop_path, name="drop_path")
        if shift > 0:
            perm, inv = shifted_window_perms(h, w, ws, shift)
            mask = jnp.asarray(shifted_window_mask(h, w, ws, shift))
        else:
            mask = None

        nw_m = 1 if mask is None else mask.shape[0]
        w_total = b * (l // n)
        # mega-fused path: LN1 + qkv + paired-window attention + proj +
        # residual in ONE Pallas kernel (ops/pallas/fused_block.py) — deletes
        # every XLA HBM pass between the token input and the MLP, measured
        # 2.35x/2.47x/1.80x/1.54x on the attention half at stages 0-3 (so
        # 'auto' engages it at EVERY stage, unlike the bare pair kernel).
        # Engages on eval forwards AND train-mode forwards whose only
        # stochasticity is drop-path (attn/proj dropout 0.0, the reference
        # config) — the kernel applies the per-window stochastic-depth scale
        # via its `keep` operand.  GRAD-BEARING paths (aux / joint training)
        # pass 'auto_grad': same kernel, but gated on a flash-style Pallas
        # BACKWARD fitting VMEM — the resident variant at stages 0-2
        # (ops/pallas/fused_block.py::_pick_pairs_bwd) and the SPILL variant
        # at stage 3 (_pick_pairs_bwd_spill: weight grads leave the kernel as
        # emitted xn/dqkv/attn and become K=T matmuls; measured 6.3x over
        # the XLA lane-slice vjp at stage-3 widths).
        # LN commutes with the token permutation, so the shifted path
        # permutes RAW x and the residual is added inside the kernel
        # pre-inverse-permute.
        train_ok = (not deterministic
                    and self.attn_drop == 0.0 and self.drop == 0.0)
        grad_mode = self.fused_attention == "auto_grad"
        if grad_mode:
            from facialmmt_tpu.ops.pallas.fused_block import (
                _pick_pairs_bwd, _pick_pairs_bwd_spill)

            bwd_fits = (_pick_pairs_bwd(
                max(w_total, 2), self.num_heads, n, c,
                max(nw_m // 2, 1), 16) > 0
                or _pick_pairs_bwd_spill(
                    max(w_total, 2), self.num_heads, n, c,
                    max(nw_m // 2, 1), 8) > 0)
        use_fused_block = (
            (deterministic or train_ok) and not self.is_initializing()
            and (self.fused_attention in ("pair", "auto")
                 or (grad_mode and bwd_fits))
            and _fused_block_backend_ok()
            and w_total % 2 == 0 and (nw_m == 1 or nw_m % 2 == 0))
        if use_fused_block:
            from facialmmt_tpu.ops.pallas import fused_block as _fb

            fused_attention_block = _fb.fused_attention_block
            p = self.variables["params"]
            table = p["attn"]["relative_position_bias_table"]
            idx = jnp.asarray(relative_position_index(ws))
            bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads
                                                  ).transpose(2, 0, 1)
            full_bias = (bias[None] if mask is None
                         else bias[None] + mask.astype(jnp.float32)[:, None])
            qkv_b = (p["attn"]["qkv"]["bias"] if self.qkv_bias
                     else jnp.zeros((3 * c,), jnp.float32))
            xp = jnp.take(x, jnp.asarray(perm), axis=1) if shift > 0 else x
            keep = self._drop_path_keep(b, deterministic)
            keep_w = (None if keep is None
                      else jnp.repeat(keep, l // n, total_repeat_length=w_total))
            y = fused_attention_block(
                xp.reshape(w_total, n, c),
                p["norm1"]["scale"], p["norm1"]["bias"],
                p["attn"]["qkv"]["kernel"], qkv_b,
                p["attn"]["proj"]["kernel"], p["attn"]["proj"]["bias"],
                full_bias, keep_w)
            x = y.reshape(b, l, c)
            if shift > 0:
                x = jnp.take(x, jnp.asarray(inv), axis=1)
        else:
            x = ln1(x)
            if shift > 0:
                x = jnp.take(x, jnp.asarray(perm), axis=1)
            xw = x.reshape(w_total, n, c)

            attn = WindowAttention(
                self.dim, ws, self.num_heads, self.qkv_bias,
                self.attn_drop, self.drop, fused=self.fused_attention,
                dtype=self.dtype, name="attn")(
                    xw, mask, deterministic=deterministic)

            x = attn.reshape(b, l, c)
            if shift > 0:
                x = jnp.take(x, jnp.asarray(inv), axis=1)

            x = shortcut + dp(x, deterministic=deterministic)

        hid = int(self.dim * self.mlp_ratio)
        ln2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        fc1 = SwinLinear(hid, dtype=self.dtype, name="mlp_fc1")
        fc2 = SwinLinear(self.dim, dtype=self.dtype, name="mlp_fc2")
        if self.fused_mlp == "auto_grad":
            # grad-bearing path: engage only where the Pallas backward fits
            # (block_mlp.py::_bwd_tile_for — stages 0-2)
            from facialmmt_tpu.ops.pallas.block_mlp import _bwd_tile_for

            use_fused_mlp = (_fused_block_backend_ok()
                             and _bwd_tile_for(self.dim, hid, b * l) > 0)
        else:
            use_fused_mlp = (
                self.fused_mlp == "on"
                or (self.fused_mlp == "auto"
                    and jax.default_backend() == "tpu"))
        # the fused kernel serves eval forwards and (via its per-token `keep`
        # stochastic-depth operand) train-mode forwards with dropout 0.0;
        # grad-bearing training uses 'auto_grad' (Pallas backward) where it
        # fits and XLA autodiff elsewhere
        train_ok = not deterministic and self.drop == 0.0
        if (use_fused_mlp and (deterministic or train_ok)
                and not self.is_initializing()):
            from facialmmt_tpu.ops.pallas.block_mlp import \
                fused_ln_mlp_residual

            keep = self._drop_path_keep(b, deterministic)
            keep_t = (None if keep is None
                      else jnp.repeat(keep, l, total_repeat_length=b * l))
            # params were created by the normal path at init; read them here
            p = self.variables["params"]
            out = fused_ln_mlp_residual(
                x.reshape(-1, self.dim),
                p["norm2"]["scale"], p["norm2"]["bias"],
                p["mlp_fc1"]["kernel"], p["mlp_fc1"]["bias"],
                p["mlp_fc2"]["kernel"], p["mlp_fc2"]["bias"], keep_t)
            return out.reshape(x.shape)
        y = ln2(x)
        y = fc1(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        y = fc2(y)
        y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        return x + dp(y, deterministic=deterministic)


class PatchMerging(nn.Module):
    """2x2 patch concat + LN + Linear(4C->2C, no bias) (reference :291-328).

    layout='raster': input is (B, H*W, C) raster rows (the reference layout).
    layout='window': input is the stage's window-resident rows and the output
    comes out in the NEXT stage's window-resident order via one static row
    gather (merge_gather_index) — exactly the same per-row math, so the two
    layouts are bitwise-equivalent up to row order (test_swin_layout.py)."""

    input_resolution: tuple[int, int]
    dim: int
    layout: str = "raster"
    window_size: int = 7       # current-stage effective ws (layout='window')
    next_window_size: int = 7  # next-stage effective ws (layout='window')
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h, w = self.input_resolution
        b, l, c = x.shape
        if self.layout == "window":
            idx = merge_gather_index(h, w, self.window_size,
                                     self.next_window_size)
            x = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=1)
            x = x.reshape(b, l // 4, 4 * c)
        else:
            x = x.reshape(b, h, w, c)
            x0 = x[:, 0::2, 0::2]
            x1 = x[:, 1::2, 0::2]
            x2 = x[:, 0::2, 1::2]
            x3 = x[:, 1::2, 1::2]
            x = jnp.concatenate([x0, x1, x2, x3],
                                axis=-1).reshape(b, l // 4, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return SwinLinear(2 * self.dim, use_bias=False, dtype=self.dtype,
                          name="reduction")(x)


class PatchEmbed(nn.Module):
    """4x4 conv patchify + optional LN (reference :392-422)."""

    config: SwinConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        p = cfg.patch_size
        b, h, w, c_in = x.shape
        # The 4x4/s4 "conv" is really a non-overlapping patch matmul.  XLA's
        # conv path pads the 3 input channels to the 8-lane minimum and runs
        # poorly; reshaping to (B, Ph*Pw, p*p*C) @ (p*p*C, E) hits the MXU as
        # one clean matmul.  The kernel keeps conv layout (p, p, C, E) so torch
        # checkpoints map unchanged (torch_convert.py).
        kernel = self.param(
            "proj_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (p, p, c_in, cfg.embed_dim), jnp.float32)
        bias = self.param("proj_bias", nn.initializers.zeros,
                          (cfg.embed_dim,), jnp.float32)
        dtype = self.dtype or x.dtype
        ph, pw = h // p, w // p
        patches = x.reshape(b, ph, p, pw, p, c_in)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, ph * pw, p * p * c_in)
        k2d = kernel.reshape(p * p * c_in, cfg.embed_dim)
        x = jnp.dot(patches.astype(dtype), k2d.astype(dtype),
                    preferred_element_type=dtype) + bias.astype(dtype)
        if cfg.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x


class SwinTransformer(nn.Module):
    """Full backbone: patchify -> 4 stages -> LN -> flatten -> Linear -> BatchNorm
    (reference Swin_Transformer.py:434-541)."""

    config: SwinConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 use_running_average: Optional[bool] = None,
                 attention_impl: Optional[str] = None):
        """x: (B, H, W, 3) channel-last, normalized images.
        Returns (B, out_feature_dim).

        attention_impl overrides config.attention_impl for this call — the
        aux task passes 'xla' so its Swin BACKWARD keeps the lane-slice
        autodiff (the pair kernel's vjp recompute costs more than its
        forward saves when grads flow: 531 vs 520 img/s measured)."""
        cfg = self.config
        attn_impl = attention_impl or cfg.attention_impl
        ura = use_running_average if use_running_average is not None else deterministic

        x = PatchEmbed(cfg, dtype=self.dtype, name="patch_embed")(x)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        total_depth = sum(cfg.depths)
        dpr = np.linspace(0, cfg.drop_path_rate, total_depth)
        res = cfg.patches_resolution
        dim = cfg.embed_dim
        blk_i = 0
        num_layers = len(cfg.depths)
        from facialmmt_tpu.config import resolve_remat

        # 'auto': remat only above 512 packed images (SwinConfig.remat note)
        block_cls = (nn.remat(SwinBlock, static_argnums=(2,))
                     if resolve_remat(cfg.remat, x.shape[0], 512)
                     else SwinBlock)
        # 'auto' merge layout: the one-gather window-resident transition on
        # TPU (measured win, SwinConfig.merge_impl), raster elsewhere
        merge_wr = (cfg.merge_impl == "window" or
                    (cfg.merge_impl == "auto"
                     and jax.default_backend() == "tpu"))
        in_window_layout = False
        for stage in range(num_layers):
            stage_res = (res[0] // (2 ** stage), res[1] // (2 ** stage))
            sh, sw = stage_res
            ws_eff = min(cfg.window_size, sh, sw)
            b = x.shape[0]
            c_stage = int(dim * 2 ** stage)
            # enter window layout ONCE for the whole stage (blocks are
            # window-resident; see SwinBlock docstring) — unless the previous
            # stage's window-resident merge already emitted it
            if not in_window_layout:
                x = window_partition(x.reshape(b, sh, sw, c_stage),
                                     ws_eff).reshape(b, sh * sw, c_stage)
            for d in range(cfg.depths[stage]):
                x = block_cls(
                    dim=c_stage, input_resolution=stage_res,
                    num_heads=cfg.num_heads[stage], window_size=cfg.window_size,
                    shift_size=0 if d % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                    drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
                    drop_path=float(dpr[blk_i]),
                    fused_attention={"xla": "off", "pallas": "on",
                                     "pair": "pair", "auto": "auto",
                                     "auto_grad": "auto_grad"}[attn_impl],
                    # the explicit 'xla' override marks a grads-flow call
                    # with the kernels demoted entirely; 'auto_grad' marks a
                    # grads-flow call that engages the kernels where their
                    # Pallas backwards fit (stages 0-2), lane-slice elsewhere
                    fused_mlp={"xla": "off", "pallas": "on",
                               "auto": "auto", "auto_grad": "auto_grad"}[
                                   "xla" if attn_impl == "xla"
                                   else ("auto_grad"
                                         if (attn_impl == "auto_grad"
                                             and cfg.mlp_impl != "xla")
                                         else cfg.mlp_impl)],
                    dtype=self.dtype,
                    name=f"stage_{stage}_block_{d}")(x, deterministic)
                blk_i += 1
            if stage < num_layers - 1 and merge_wr:
                ws_next = min(cfg.window_size, sh // 2, sw // 2)
                x = PatchMerging(stage_res, c_stage, layout="window",
                                 window_size=ws_eff,
                                 next_window_size=ws_next, dtype=self.dtype,
                                 name=f"stage_{stage}_downsample")(x)
                in_window_layout = True
                continue
            x = window_reverse(
                x.reshape(b * (sh * sw) // (ws_eff * ws_eff),
                          ws_eff * ws_eff, c_stage),
                ws_eff, sh, sw).reshape(b, sh * sw, c_stage)
            in_window_layout = False
            if stage < num_layers - 1:
                x = PatchMerging(stage_res, c_stage, dtype=self.dtype,
                                 name=f"stage_{stage}_downsample")(x)

        # head: LN -> flatten -> Linear(-> out_feature_dim) -> BatchNorm1d
        x = nn.LayerNorm(epsilon=1e-5, name="head_norm")(x)
        x = x.reshape(x.shape[0], -1)
        x = SwinLinear(cfg.out_feature_dim, dtype=self.dtype, name="head_linear")(x)
        x = nn.BatchNorm(use_running_average=ura, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="head_bn")(x)
        return x


def swin_flops(cfg: SwinConfig) -> int:
    """Analytic FLOPs estimate, mirroring the reference's flops() capability
    (reference Swin_Transformer.py:149-160, 276-288, 333-337, 383-389, 424-429)."""
    flops = 0
    ho, wo = cfg.patches_resolution
    flops += ho * wo * cfg.embed_dim * cfg.in_chans * cfg.patch_size ** 2
    if cfg.patch_norm:
        flops += ho * wo * cfg.embed_dim
    dim = cfg.embed_dim
    for stage in range(len(cfg.depths)):
        h = ho // (2 ** stage)
        w = wo // (2 ** stage)
        d = int(dim * 2 ** stage)
        ws = min(cfg.window_size, h)
        n = ws * ws
        per_win = n * d * 3 * d + cfg.num_heads[stage] * n * (d // cfg.num_heads[stage]) * n * 2 + n * d * d
        nw = h * w / n
        per_block = d * h * w * 2 + nw * per_win + 2 * h * w * d * d * cfg.mlp_ratio
        flops += int(per_block * cfg.depths[stage])
        if stage < len(cfg.depths) - 1:
            flops += h * w * d + (h // 2) * (w // 2) * 4 * d * 2 * d
    flops += cfg.num_features * ho * wo // (4 ** (len(cfg.depths) - 1))
    flops += (49 * cfg.num_features) * cfg.out_feature_dim
    return int(flops)
