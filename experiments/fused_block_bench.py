"""Measure the mega-fused attention-block kernel vs the r2 eval path.

Per Swin stage (256-face batch widths), times the attention HALF of a block —
everything between the token input and the MLP:

  path A (r2 'auto' eval): LN1 -> qkv TorchLinear -> (W,h,N,hd) transposes ->
         paired_window_attention (nh<=6) or lane-slice XLA (nh>6) ->
         inverse transpose -> proj -> residual       [all XLA except the pair kernel]
  path B: fused_attention_block (ops/pallas/fused_block.py) — one kernel.

Measurement hygiene (CLAUDE.md): ops chained inside ONE jit via fori_loop
(x = f(x) is shape-preserving), one host readback at the end; best of 3
windows.  Run on the real chip:  python experiments/fused_block_bench.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from facialmmt_tpu.ops.pallas.fused_block import fused_attention_block
from facialmmt_tpu.ops.pallas.window_attention import paired_window_attention
from facialmmt_tpu.ops.swin import relative_position_index, shifted_window_mask

B = 256          # faces
ITERS = 20

STAGES = [  # (grid, C, heads) for swin-tiny at 224px
    (56, 96, 3),
    (28, 192, 6),
    (14, 384, 12),
    (7, 768, 24),
]


def make_stage(rng, grid, c, h, shifted):
    ws = 7
    n = ws * ws
    w = B * (grid // ws) ** 2
    nw = (grid // ws) ** 2
    # big activations are generated ON DEVICE (one jit): host-side np.random
    # for a (16384, 49, 96) tensor costs minutes on this 1-core machine
    x = jax.jit(lambda k: jax.random.normal(k, (w, n, c), jnp.bfloat16))(
        jax.random.PRNGKey(int(rng.integers(1 << 30))))
    gamma = jnp.asarray(rng.normal(size=(c,)) * 0.02 + 1, jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.02, jnp.float32)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.02, jnp.float32)
    bproj = jnp.zeros((c,), jnp.float32)
    table = jnp.asarray(rng.normal(size=((2 * ws - 1) ** 2, h)) * 0.02,
                        jnp.float32)
    idx = jnp.asarray(relative_position_index(ws))
    bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)[None]
    if shifted and nw > 1:
        mask = jnp.asarray(shifted_window_mask(grid, grid, ws, ws // 2))
        bias = bias + mask[:, None]
    else:
        bias = jnp.broadcast_to(bias, (max(nw, 1), h, n, n)) * 1.0
        bias = bias[:1]
    return x, gamma, beta, wqkv, bqkv, wproj, bproj, bias


def path_a(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, h):
    """The r2 eval path: XLA LN/qkv/proj + pair kernel (nh<=6) or lane-slice."""
    w, n, c = x.shape
    hd = c // h
    nw = bias.shape[0]
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta).astype(
        x.dtype)
    qkv = (jnp.dot(xn.reshape(w * n, c), wqkv.astype(x.dtype),
                   preferred_element_type=jnp.float32)
           + bqkv).astype(x.dtype).reshape(w, n, 3 * c)
    scale = hd ** -0.5
    if h <= 6:
        qh = qkv[..., :c].reshape(w, n, h, hd)
        kh = qkv[..., c:2 * c].reshape(w, n, h, hd)
        vh = qkv[..., 2 * c:].reshape(w, n, h, hd)
        out = paired_window_attention(
            (qh * scale).transpose(0, 2, 1, 3), kh.transpose(0, 2, 1, 3),
            vh.transpose(0, 2, 1, 3), bias)
        attn = out.transpose(0, 2, 1, 3).reshape(w, n, c)
    else:
        outs = []
        for head in range(h):
            q = qkv[..., head * hd:(head + 1) * hd]
            k = qkv[..., c + head * hd:c + (head + 1) * hd]
            v = qkv[..., 2 * c + head * hd:2 * c + (head + 1) * hd]
            s = jnp.einsum("bnd,bmd->bnm", q * scale, k,
                           preferred_element_type=jnp.float32)
            s = s.reshape(w // nw, nw, n, n) + bias[:, head][None]
            p = jax.nn.softmax(s.reshape(w, n, n), -1).astype(x.dtype)
            outs.append(jnp.einsum("bnm,bmd->bnd", p, v))
        attn = jnp.concatenate(outs, -1)
    y = jnp.dot(attn.reshape(w * n, c), wproj.astype(x.dtype),
                preferred_element_type=jnp.float32) + bproj
    return (xf + y.reshape(w, n, c)).astype(x.dtype)


def timed(fn, x, args):
    @jax.jit
    def chain(x):
        def body(_, x):
            y = fn(x, *args)
            return (y * 0.5).astype(x.dtype)   # keep magnitudes bounded
        return jax.lax.fori_loop(0, ITERS, body, x)

    out = chain(x)
    float(jnp.sum(out.astype(jnp.float32)))  # compile+warm sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(x)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3


def one_stage(rng, si, grid, c, h, shifted):
    x, *args = make_stage(rng, grid, c, h, shifted)
    # jitted single-step fns double as the on-device correctness check
    # (NEVER run these eagerly: axon remote-compiles per op — CLAUDE.md)
    fa = jax.jit(lambda x, *a: path_a(x, *a, h))
    fb = jax.jit(lambda x, *a: fused_attention_block(*(x,) + a))
    ya = fa(x, *args)
    yb = fb(x, *args)
    rel = float(jnp.max(jnp.abs((ya - yb).astype(jnp.float32)))) / float(
        jnp.max(jnp.abs(ya.astype(jnp.float32))))
    a = timed(lambda x, *a: path_a(x, *a, h), x, args)
    b = timed(lambda x, *a: fused_attention_block(*(x,) + a), x, args)
    tag = "shift" if shifted else "     "
    print(f"stage{si} {tag} (W={x.shape[0]:5d}, h={h:2d}, C={c:3d}): "
          f"pathA {a:6.2f} ms   fused {b:6.2f} ms   "
          f"({a / b:4.2f}x)  rel|d|={rel:.4f}", flush=True)


def main(only=None):
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, {B} faces, "
          f"per-op ms (chained x{ITERS}, best of 3)", flush=True)
    for si, (grid, c, h) in enumerate(STAGES):
        if only is not None and si not in only:
            continue
        for shifted in (False, True):
            one_stage(rng, si, grid, c, h, shifted)


# ---- whole-block comparison: fused attn + tiled-MLP kernel (split) vs the
# single whole-block kernel (fused_whole_block).  Run: ... --whole [stages]
def make_mlp(rng, c):
    hid = 4 * c
    return (jnp.asarray(rng.normal(size=(c,)) * 0.02 + 1, jnp.float32),
            jnp.zeros((c,), jnp.float32),
            jnp.asarray(rng.normal(size=(c, hid)) * 0.02, jnp.float32),
            jnp.zeros((hid,), jnp.float32),
            jnp.asarray(rng.normal(size=(hid, c)) * 0.02, jnp.float32),
            jnp.zeros((c,), jnp.float32))


def whole_stage(rng, si, grid, c, h, shifted):
    from facialmmt_tpu.ops.pallas.block_mlp import fused_ln_mlp_residual
    from facialmmt_tpu.ops.pallas.fused_block import (fused_attention_block,
                                                      fused_whole_block)

    x, *attn_args = make_stage(rng, grid, c, h, shifted)
    mlp_args = make_mlp(rng, c)

    def split(x, *a):
        y = fused_attention_block(x, *a[:7])
        w, n, _ = x.shape
        g2, b2, w1, b1, w2, b2b = a[7:]
        return fused_ln_mlp_residual(y.reshape(w * n, c), g2, b2, w1, b1,
                                     w2, b2b).reshape(w, n, c)

    def whole(x, *a):
        return fused_whole_block(x, *a)

    args = tuple(attn_args) + mlp_args
    fa = jax.jit(split)
    fb = jax.jit(whole)
    ya, yb = fa(x, *args), fb(x, *args)
    rel = float(jnp.max(jnp.abs((ya - yb).astype(jnp.float32)))) / float(
        jnp.max(jnp.abs(ya.astype(jnp.float32))))
    a = timed(split, x, args)
    b = timed(whole, x, args)
    tag = "shift" if shifted else "     "
    print(f"stage{si} {tag} (W={x.shape[0]:5d}, h={h:2d}, C={c:3d}): "
          f"split {a:6.2f} ms   whole {b:6.2f} ms   ({a / b:4.2f}x)  "
          f"rel|d|={rel:.4f}", flush=True)


def main_whole(only=None):
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, {B} faces, whole-block "
          f"(chained x{ITERS}, best of 3)", flush=True)
    for si, (grid, c, h) in enumerate(STAGES):
        if only is not None and si not in only:
            continue
        for shifted in (False, True):
            whole_stage(rng, si, grid, c, h, shifted)


# ---- backward comparison: XLA autodiff of the lane-slice formulation (the
# path grad-bearing training uses today) vs the Pallas backward kernel
# (fused_block._bwd_impl_pallas via custom_vjp).  Run: ... --bwd [stages]
def timed_grad(fn, x, args, dy):
    """fwd+bwd per iteration, chained through dx (+ a live scalar from the
    weight grads so their computation isn't DCE'd); one readback at the end.
    dy and the weights ride as EXPLICIT jit args — closed-over device arrays
    embed in the HLO as constants and the tunnel's remote_compile endpoint
    chokes on large payloads (CLAUDE.md)."""
    @jax.jit
    def chain_w(x, dy, *args):
        # weight grads included: vjp over every differentiable operand
        def body(_, x):
            y, vjp = jax.vjp(fn, x, *args)
            grads = vjp(dy)
            dx = grads[0]
            wsum = sum(jnp.sum(g.astype(jnp.float32)) for g in grads[1:])
            return (x * 0.99 + 1e-3 * dx
                    + (wsum * 1e-30).astype(x.dtype)).astype(x.dtype)
        return jax.lax.fori_loop(0, ITERS, body, x)

    out = chain_w(x, dy, *args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain_w(x, dy, *args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3


def bwd_stage(rng, si, grid, c, h, shifted):
    from facialmmt_tpu.ops.pallas.fused_block import _reference

    x, *args = make_stage(rng, grid, c, h, shifted)
    args = tuple(args)
    dy = jax.jit(lambda k: jax.random.normal(k, x.shape, x.dtype))(
        jax.random.PRNGKey(int(rng.integers(1 << 30))))

    ref = lambda x, *a: _reference(x, *a, None, 1e-5)
    fused = lambda x, *a: fused_attention_block(*(x,) + a)

    # grad parity check (wrt x + all weights) before timing; dy explicit
    ga = jax.jit(lambda x, dy, *a: jax.vjp(ref, x, *a)[1](dy))(x, dy, *args)
    gb = jax.jit(lambda x, dy, *a: jax.vjp(fused, x, *a)[1](dy))(x, dy, *args)
    rels = []
    for a, b in zip(ga, gb[:len(ga)]):
        denom = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) or 1.0
        if b is None:
            continue
        # bias cotangent: compare window-sums (the group-0 convention)
        if a.ndim == 4 and a.shape == args[6].shape:
            a, b = a.sum(0), b.sum(0)
        rels.append(float(jnp.max(jnp.abs(
            (a - b).astype(jnp.float32)))) / denom)
    a_ms = timed_grad(ref, x, args, dy)
    b_ms = timed_grad(fused, x, args, dy)
    tag = "shift" if shifted else "     "
    print(f"stage{si} {tag} (W={x.shape[0]:5d}, h={h:2d}, C={c:3d}): "
          f"xla-vjp {a_ms:6.2f} ms   pallas-bwd {b_ms:6.2f} ms   "
          f"({a_ms / b_ms:4.2f}x)  max rel|dgrad|={max(rels):.4f}", flush=True)


def main_bwd(only=None):
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, {B} faces, fwd+bwd per-op ms "
          f"(chained x{ITERS}, best of 3)", flush=True)
    for si, (grid, c, h) in enumerate(STAGES):
        if only is not None and si not in only:
            continue
        for shifted in (False, True):
            bwd_stage(rng, si, grid, c, h, shifted)


# ---- resident vs SPILL backward at stages where BOTH fit: is the spill
# variant (weight grads as K=T matmuls outside the kernel) also better at
# mid widths, where the resident per-pair K=2N weight-grad matmuls produce
# (C, C) outputs?  Run: ... --spill [stages]
def spill_stage(rng, si, grid, c, h, shifted):
    from facialmmt_tpu.ops.pallas.fused_block import (_bwd_impl_pallas,
                                                      _bwd_impl_spill,
                                                      _pick_pairs_bwd,
                                                      _pick_pairs_bwd_spill,
                                                      _reference)

    x, *args = make_stage(rng, grid, c, h, shifted)
    gamma, beta, wqkv, bqkv, wproj, bproj, bias = args
    dy = jax.jit(lambda k: jax.random.normal(k, x.shape, x.dtype))(
        jax.random.PRNGKey(int(rng.integers(1 << 30))))
    w = x.shape[0]
    groups = max(bias.shape[0] // 2, 1)
    p_res = _pick_pairs_bwd(w, h, 49, c, groups, 8)
    p_sp = _pick_pairs_bwd_spill(w, h, 49, c, groups, 8)
    if p_res == 0 or p_sp == 0:
        print(f"stage{si}: resident pairs={p_res} spill pairs={p_sp} — "
              f"skipping (need both)", flush=True)
        return

    def timed_bwd(impl, pairs):
        @jax.jit
        def chain(x, dy, gamma, beta, wqkv, bqkv, wproj, bias):
            def body(_, x):
                out = impl(x, gamma, beta, wqkv, bqkv, wproj, bias, None,
                           dy, pairs, 1e-5, False)
                dx = out[0]
                wsum = sum(jnp.sum(g.astype(jnp.float32))
                           for g in out[1:] if g is not None)
                return (x * 0.99 + 1e-3 * dx
                        + (wsum * 1e-30).astype(x.dtype)).astype(x.dtype)
            return jax.lax.fori_loop(0, ITERS, body, x)

        out = chain(x, dy, gamma, beta, wqkv, bqkv, wproj, bias)
        float(jnp.sum(out.astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = chain(x, dy, gamma, beta, wqkv, bqkv, wproj, bias)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best * 1e3

    a_ms = timed_bwd(_bwd_impl_pallas, p_res)
    b_ms = timed_bwd(_bwd_impl_spill, p_sp)
    tag = "shift" if shifted else "     "
    print(f"stage{si} {tag} (W={w:5d}, h={h:2d}, C={c:3d}): "
          f"resident {a_ms:6.2f} ms (p={p_res})   "
          f"spill {b_ms:6.2f} ms (p={p_sp})   ({a_ms / b_ms:4.2f}x)",
          flush=True)


def main_spill(only=None):
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, {B} faces, bwd-only per-op ms "
          f"(chained x{ITERS}, best of 3)", flush=True)
    for si, (grid, c, h) in enumerate(STAGES):
        if only is not None and si not in only:
            continue
        for shifted in (False, True):
            spill_stage(rng, si, grid, c, h, shifted)


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--whole":
        main_whole([int(a) for a in argv[1:]] or None)
    elif argv and argv[0] == "--bwd":
        main_bwd([int(a) for a in argv[1:]] or None)
    elif argv and argv[0] == "--spill":
        main_spill([int(a) for a in argv[1:]] or None)
    else:
        main([int(a) for a in argv] or None)
