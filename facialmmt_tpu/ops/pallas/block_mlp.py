"""Fused LN -> MLP -> residual Pallas kernel for Swin blocks.

The XLA path materializes the (T, 4C) GELU intermediate to HBM between fc1 and
fc2 (617 MB per stage-0 block at 256 images) and runs LayerNorm as separate
HBM passes; measured ~4.6 ms per stage-0 block (~26 TFLOP/s).  This kernel
keeps the whole `x + fc2(gelu(fc1(LN(x))))` chain VMEM-resident per token
tile: HBM traffic drops to read-x + write-out + weights.

Semantics match reference Swin_Transformer.py:252-270 at eval (drop_path /
dropout are identity at eval; training uses the XLA path via the block's
remat).  GELU is exact-erf like torch.nn.GELU default.

Backward: custom_vjp falls back to jax.vjp of the reference math — the kernel
is a forward/eval optimization (training keeps full-precision autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """float32 erf (Mosaic lacks an erf primitive): Abramowitz & Stegun
    7.1.26, max abs error 1.5e-7 — far inside the bf16 cast that follows."""
    sign = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + jnp.float32(0.3275911) * a)
    poly = t * (jnp.float32(0.254829592)
                + t * (jnp.float32(-0.284496736)
                       + t * (jnp.float32(1.421413741)
                              + t * (jnp.float32(-1.453152027)
                                     + t * jnp.float32(1.061405429)))))
    return sign * (1.0 - poly * jnp.exp(-a * a))


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest,
            eps: float, has_keep: bool):
    keep_ref = rest[0] if has_keep else None
    o_ref = rest[-1]
    x = x_ref[:].astype(jnp.float32)                      # (tile, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    h = jnp.dot(xn.astype(jnp.bfloat16), w1_ref[:],
                preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    # exact-erf GELU (torch nn.GELU default; reference Mlp uses act_layer=GELU)
    # _erf is XLA's own ErfImpl32 polynomial, so numerics match the XLA path
    h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
    y = jnp.dot(h.astype(jnp.bfloat16), w2_ref[:],
                preferred_element_type=jnp.float32)
    y = y + b2_ref[:].astype(jnp.float32)
    if has_keep:
        # per-token stochastic-depth scale (0 or 1/keep_prob)
        y = y * keep_ref[:].astype(jnp.float32)
    o_ref[:] = (x + y).astype(o_ref.dtype)


def _tile_for(c_in: int, t: int) -> int:
    """Token-tile size: keep x + 4C intermediate + double buffers in budget."""
    budget = 6 * 1024 * 1024
    per_token = (c_in * 2 + 4 * c_in * 4 + 4 * c_in * 2 + c_in * 4) * 2
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


def _fwd_impl(x, gamma, beta, w1, b1, w2, b2, keep, eps, interpret):
    t, c = x.shape
    c4 = w1.shape[1]
    tile = _tile_for(c, t)
    if tile < 128:  # awkward T: zero-pad tokens to a clean tile multiple
        tile = 128
        pad = (-t) % tile
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        kp = None if keep is None else jnp.pad(keep.reshape(t), ((0, pad),))
        out = _fwd_impl(xp, gamma, beta, w1, b1, w2, b2, kp, eps, interpret)
        return out[:t]
    grid = (t // tile,)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [xspec, vec(c), vec(c), mat(c, c4), vec(c4),
                mat(c4, c), vec(c)]
    operands = [x, gamma.reshape(1, c), beta.reshape(1, c),
                w1.astype(jnp.bfloat16), b1.reshape(1, c4),
                w2.astype(jnp.bfloat16), b2.reshape(1, c)]
    if keep is not None:
        in_specs.append(pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(keep.reshape(t, 1).astype(jnp.float32))
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, has_keep=keep is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((t, c), x.dtype),
        interpret=interpret,
    )(*operands)


def _reference(x, gamma, beta, w1, b1, w2, b2, keep, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    h = jnp.dot(xn.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b1
    h = 0.5 * h * (1.0 + jax.lax.erf(h * (2.0 ** -0.5)))
    y = jnp.dot(h.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b2
    if keep is not None:
        y = y * keep.reshape(-1, 1).astype(jnp.float32)
    return (xf + y).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_ln_mlp_residual(x, gamma, beta, w1, b1, w2, b2, keep=None,
                          eps: float = 1e-5, interpret: bool = False):
    """x: (T, C) tokens; returns x + keep * fc2(gelu(fc1(LN(x)))) — one HBM
    pass.  keep: optional (T,) per-token stochastic-depth multiplier (0 or
    1/keep_prob) — lets the kernel serve train-mode stop-grad forwards."""
    return _fwd_impl(x, gamma, beta, w1, b1, w2, b2, keep, eps, interpret)


def _fwd(x, gamma, beta, w1, b1, w2, b2, keep, eps, interpret):
    out = _fwd_impl(x, gamma, beta, w1, b1, w2, b2, keep, eps, interpret)
    return out, (x, gamma, beta, w1, b1, w2, b2, keep)


# ------------------------------------------------------------ Pallas backward --
#
# Same flash-style scheme as fused_block.py's attention backward: recompute
# LN/fc1/GELU per token tile in VMEM, emit dx plus fp32 weight-grad
# accumulators in constant-index output blocks (TPU grid cells run
# sequentially: initialize at cell 0, accumulate after).  Deletes the XLA
# backward's HBM materialization of the (T, 4C) GELU intermediate and its
# recompute passes.  Stage fit: the fp32 dw1+dw2 accumulators cost 2*C*4C*4
# bytes — stages 0-2 fit, stage 3 (768x3072: 18.9 MB) falls back to the XLA
# autodiff of the exact reference math.

def _gelu_grad(h):
    """d/dh [h * Phi(h)] = Phi(h) + h * phi(h), exact-erf GELU."""
    phi = jnp.exp(-0.5 * h * h) * jnp.float32(0.3989422804014327)
    cdf = 0.5 * (1.0 + _erf(h * (2.0 ** -0.5)))
    return cdf + h * phi


def _bwd_kernel(x_ref, dy_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, *rest,
                eps: float, has_keep: bool):
    keep_ref = rest[0] if has_keep else None
    dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref = rest[-7:]
    cell = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)                          # (tile, C)
    dy = dy_ref[:].astype(jnp.float32)
    gamma = g_ref[:].astype(jnp.float32)
    # ---- recompute forward (same casts as _kernel) ----
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xh = (x - mean) * rstd
    xn = xh * gamma + b_ref[:].astype(jnp.float32)
    xn_b = xn.astype(jnp.bfloat16)
    h = jnp.dot(xn_b, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    g = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
    g_b = g.astype(jnp.bfloat16)
    # ---- branch grad: out = x + keep * (g @ w2 + b2) ----
    if has_keep:
        dyk = dy * keep_ref[:].astype(jnp.float32)
    else:
        dyk = dy
    dyk_b = dyk.astype(jnp.bfloat16)
    dgm = jax.lax.dot_general(dyk_b, w2_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh = dgm * _gelu_grad(h)
    dh_b = dh.astype(jnp.bfloat16)
    dxn = jax.lax.dot_general(dh_b, w1_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # ---- LN backward ----
    dxhat = dxn * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xh, axis=-1, keepdims=True)
    dx_ref[:] = (dy + rstd * (dxhat - m1 - xh * m2)).astype(dx_ref.dtype)
    # ---- weight-grad accumulators (constant index blocks) ----
    dg_acc = jnp.sum(dxn * xh, axis=0, keepdims=True)
    db_acc = jnp.sum(dxn, axis=0, keepdims=True)
    dw1_acc = jax.lax.dot_general(xn_b, dh_b, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    db1_acc = jnp.sum(dh, axis=0, keepdims=True)
    dw2_acc = jax.lax.dot_general(g_b, dyk_b, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    db2_acc = jnp.sum(dyk, axis=0, keepdims=True)

    @pl.when(cell == 0)
    def _():
        dg_ref[:] = dg_acc
        db_ref[:] = db_acc
        dw1_ref[:] = dw1_acc
        db1_ref[:] = db1_acc
        dw2_ref[:] = dw2_acc
        db2_ref[:] = db2_acc

    @pl.when(cell != 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg_acc
        db_ref[:] = db_ref[:] + db_acc
        dw1_ref[:] = dw1_ref[:] + dw1_acc
        db1_ref[:] = db1_ref[:] + db1_acc
        dw2_ref[:] = dw2_ref[:] + dw2_acc
        db2_ref[:] = db2_ref[:] + db2_acc


def _bwd_tile_for(c: int, c4: int, t: int) -> int:
    """Token tile for the backward; 0 = does not fit (XLA fallback).  Besides
    the forward's intermediates the backward keeps dy/dx tiles, the (tile, 4C)
    dh chain and the fp32 dw1/dw2 accumulators resident."""
    c_p = (c + 127) // 128 * 128
    c4_p = (c4 + 127) // 128 * 128
    accum_bytes = 2 * c * c4_p * 4 + 6 * c_p * 4
    weight_bytes = 2 * c * c4_p * 2
    # 12 MB (vs the forward's 6): the resident fp32 accumulators are the
    # budget, not pipelining depth — stage 2 lands at ~11 MB with tile 128
    budget = 12 * 1024 * 1024 - accum_bytes - weight_bytes
    # per token: x/dy/dx tiles (bf16, double-buffered) + h/g/dh/dgm fp32 rows
    per_token = 3 * 2 * c_p * 2 + 4 * c4_p * 4 + 2 * c_p * 4
    tile = budget // per_token
    if tile < 128:
        return 0
    for cand in (2048, 1024, 512, 256, 128):
        if cand <= tile:
            tile = cand
            break
    else:
        tile = 128
    while t % tile != 0:
        tile //= 2
    return tile if tile >= 128 else 0


def _bwd_impl_pallas(x, gamma, beta, w1, b1, w2, b2, keep, grad, tile, eps,
                     interpret):
    t, c = x.shape
    c4 = w1.shape[1]
    grid = (t // tile,)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [xspec, xspec, vec(c), vec(c), mat(c, c4), vec(c4), mat(c4, c)]
    operands = [x, grad.astype(x.dtype), gamma.reshape(1, c),
                beta.reshape(1, c), w1.astype(jnp.bfloat16),
                b1.reshape(1, c4), w2.astype(jnp.bfloat16)]
    has_keep = keep is not None
    if has_keep:
        in_specs.append(pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(keep.reshape(t, 1).astype(jnp.float32))
    out_shape = [jax.ShapeDtypeStruct((t, c), x.dtype),
                 jax.ShapeDtypeStruct((1, c), jnp.float32),
                 jax.ShapeDtypeStruct((1, c), jnp.float32),
                 jax.ShapeDtypeStruct((c, c4), jnp.float32),
                 jax.ShapeDtypeStruct((1, c4), jnp.float32),
                 jax.ShapeDtypeStruct((c4, c), jnp.float32),
                 jax.ShapeDtypeStruct((1, c), jnp.float32)]
    out_specs = [xspec, vec(c), vec(c), mat(c, c4), vec(c4), mat(c4, c),
                 vec(c)]
    dx, dg, db, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, has_keep=has_keep),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    dkeep = None if keep is None else jnp.zeros_like(keep)
    return (dx, dg.reshape(c).astype(gamma.dtype),
            db.reshape(c).astype(beta.dtype), dw1.astype(w1.dtype),
            db1.reshape(c4).astype(b1.dtype), dw2.astype(w2.dtype),
            db2.reshape(c).astype(b2.dtype), dkeep)


def _bwd(eps, interpret, res, grad):
    x, gamma, beta, w1, b1, w2, b2, keep = res
    t, c = x.shape
    backend_ok = jax.default_backend() == "tpu" or interpret
    pad = (-t) % 128
    tile = _bwd_tile_for(c, w1.shape[1], t + pad)
    if backend_ok and tile > 0:
        if pad:
            # zero-padded rows are inert: dy rows are 0 -> dxn rows are 0 ->
            # zero contribution to every weight grad and dx pad rows are 0
            xp = jnp.pad(x, ((0, pad), (0, 0)))
            gp = jnp.pad(grad, ((0, pad), (0, 0)))
            kp = None if keep is None else jnp.pad(keep.reshape(t), (0, pad))
            out = _bwd_impl_pallas(xp, gamma, beta, w1, b1, w2, b2, kp, gp,
                                   tile, eps, interpret)
            dkeep = None if keep is None else out[7][:t].reshape(keep.shape)
            return (out[0][:t],) + out[1:7] + (dkeep,)
        return _bwd_impl_pallas(x, gamma, beta, w1, b1, w2, b2, keep, grad,
                                tile, eps, interpret)
    _, vjp = jax.vjp(lambda *a: _reference(*a, eps), *res)
    grads = vjp(grad)
    if keep is not None:
        # keep (stochastic-depth mask) is non-differentiable by convention:
        # the Pallas backward returns a zero cotangent, so the fallback must
        # too — same custom_vjp, same gradients on every backend (r3 review)
        grads = grads[:7] + (jnp.zeros_like(grads[7]),)
    return grads


fused_ln_mlp_residual.defvjp(_fwd, _bwd)
