"""Paired-window (G=2) window-attention experiments on the real chip.

Hypothesis (CLAUDE.md perf ledger): the attention chain sits at the MXU
instance floor (~100 cycles per 49-row batched-matmul instance, row floor
49).  Packing TWO windows into one matmul pair (98 rows, 98 lanes — still a
single 128-lane tile, unlike the measured G=4 merge whose 196 lanes split
into two tiles) halves the instance count for ~2x the (cheap) FLOPs:
expected ~1.3x on the chain.

Variants measured per stage shape, chained inside ONE jit (dispatch hygiene):
  xla   — the production lane-slice path (ops/swin.py)
  v2g2  — existing pallas v2 with group=2 (XLA-side merge transpose)
  v3g2  — new: in-kernel sublane concat, no XLA-side merge
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facialmmt_tpu.ops.pallas.window_attention import (
    fused_window_attention_v2, _block_diag_bias)

# stage shapes for swin-tiny @224, 256-face batch
# (windows, heads, N, hd, nW distinct bias rows for the shifted case)
STAGES = [
    ("stage0", 16384, 3, 49, 32, 64),
    ("stage1", 4096, 6, 49, 32, 16),
    ("stage2", 1024, 12, 49, 32, 4),
    ("stage3", 256, 24, 49, 32, 1),
]


def make_v3(num_heads: int, groups: int, pairs: int):
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
                o2 = jnp.dot(pr, v2, preferred_element_type=jnp.float32
                             ).astype(o_ref.dtype)
                o_ref[2 * p, head] = o2[:49]
                o_ref[2 * p + 1, head] = o2[49:]
    return kernel


def v3g2(q, k, v, bias, pairs=8):
    w, h, n, hd = q.shape
    g = 2
    big = jnp.asarray(_block_diag_bias(bias, g), jnp.bfloat16)
    groups = big.shape[0]
    # VMEM-aware: 4 operands, double-buffered, with (49->64, 32->128) padding
    per_pair = 4 * 2 * g * h * 64 * 128 * 2
    while pairs > 1 and pairs * per_pair > 10 * 1024 * 1024:
        pairs //= 2
    while (w // g) % pairs != 0:
        pairs //= 2
    spec = pl.BlockSpec((g * pairs, h, n, hd), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_v3(h, groups, pairs),
        grid=(w // (g * pairs),),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((groups, h, g * n, g * n),
                               lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((w, h, n, hd), q.dtype),
    )(q, k, v, big)


def make_v4(num_heads: int, hd: int, groups: int, pairs: int, c: int):
    """Heads stay packed in lanes: q/k/v arrive as (W, N, C); per pair the
    kernel concats two windows on sublanes (98 rows) and lane-slices each
    head's hd=32 chunk.  4x less VMEM padding than the (W, h, N, hd) layout."""
    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        cell = pl.program_id(0)
        for p in range(pairs):
            bias_idx = jax.lax.rem(cell * pairs + p, groups)
            q2 = jnp.concatenate([q_ref[2 * p], q_ref[2 * p + 1]], axis=0)
            k2 = jnp.concatenate([k_ref[2 * p], k_ref[2 * p + 1]], axis=0)
            v2 = jnp.concatenate([v_ref[2 * p], v_ref[2 * p + 1]], axis=0)
            outs = []
            for head in range(num_heads):
                qh = q2[:, head * hd:(head + 1) * hd]
                kh = k2[:, head * hd:(head + 1) * hd]
                vh = v2[:, head * hd:(head + 1) * hd]
                s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
                s = s + bias_ref[bias_idx, head]
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                pr = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(vh.dtype)
                outs.append(jnp.dot(pr, vh, preferred_element_type=jnp.float32
                                    ).astype(o_ref.dtype))
            o2 = jnp.concatenate(outs, axis=-1)
            o_ref[2 * p] = o2[:49]
            o_ref[2 * p + 1] = o2[49:]
    return kernel


def v4g2(q, k, v, bias, pairs=16):
    """q/k/v: (W, N, C) pre-scaled q; bias (nW, h, N, N)."""
    w, n, c = q.shape
    nw, h = bias.shape[:2]
    hd = c // h
    g = 2
    big = jnp.asarray(_block_diag_bias(bias, g), jnp.bfloat16)
    groups = big.shape[0]
    c_pad = (c + 127) // 128 * 128
    per_pair = 4 * 2 * g * 64 * c_pad * 2
    while pairs > 1 and pairs * per_pair > 10 * 1024 * 1024:
        pairs //= 2
    while (w // g) % pairs != 0:
        pairs //= 2
    spec = pl.BlockSpec((g * pairs, n, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_v4(h, hd, groups, pairs, c),
        grid=(w // (g * pairs),),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((groups, h, g * n, g * n),
                               lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((w, n, c), q.dtype),
    )(q, k, v, big)


def xla_lane_slice(qkv, bias, mask, nh, hd, scale):
    b_, n, c3 = qkv.shape
    c = c3 // 3
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
            s = s.reshape(b_ // nw, nw, n, n) + mask[None]
            s = s.reshape(b_, n, n)
        p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
        outs.append(jnp.einsum("bnm,bmd->bnd", p, v))
    return jnp.concatenate(outs, axis=-1)


def chain(fn, x0, iters):
    def body(x, _):
        y = fn(x)
        # feed a scalar back to serialize without changing shapes
        return x + jnp.mean(y).astype(x.dtype) * 1e-6, None
    return jax.lax.scan(body, x0, None, length=iters)[0]


def bench(name, jfn, x0, iters=10):
    r = jfn(x0)
    jnp.mean(r)  # noqa
    float(jnp.mean(r))  # compile+sync
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(jfn(x0)))
        best = min(best, time.perf_counter() - t0)
    print(f"  {name:8s} {best / iters * 1e3:8.2f} ms/iter")
    return best / iters


def main():
    iters = 10
    for sname, w, h, n, hd, nw in STAGES:
        c = h * hd
        key = jax.random.PRNGKey(0)
        qkv = jax.jit(lambda k: jax.random.normal(
            k, (w, n, 3 * c), jnp.bfloat16))(key)
        bias = jax.jit(lambda k: jax.random.normal(
            k, (h, n, n), jnp.float32))(key)
        mask = jax.jit(lambda k: jax.random.normal(
            k, (nw, n, n), jnp.float32))(key) if nw > 1 else None
        scale = hd ** -0.5
        print(f"{sname}: W={w} h={h} nW={nw}")

        def split_heads(qkv):
            c = qkv.shape[-1] // 3
            q = qkv[..., :c].reshape(w, n, h, hd).transpose(0, 2, 1, 3)
            k = qkv[..., c:2 * c].reshape(w, n, h, hd).transpose(0, 2, 1, 3)
            v = qkv[..., 2 * c:].reshape(w, n, h, hd).transpose(0, 2, 1, 3)
            return q * scale, k, v

        full_bias = (bias[None] + (mask[:, None] if mask is not None else 0.0))
        if full_bias.ndim == 3:
            full_bias = full_bias[None]

        fx = jax.jit(lambda x: chain(
            lambda t: xla_lane_slice(t, bias, mask, h, hd, scale), x, iters))
        bench("xla", fx, qkv, iters)

        def pal(fn):
            def one(t):
                q, k, v = split_heads(t)
                o = fn(q, k, v, full_bias)
                return o.transpose(0, 2, 1, 3).reshape(w, n, c)
            return jax.jit(lambda x: chain(one, x, iters))

        try:
            bench("v3g2", pal(v3g2), qkv, iters)
        except Exception as e:
            print(f"  v3g2 FAILED: {type(e).__name__}: {str(e)[:160]}")

        def pal4(t):
            cc = t.shape[-1] // 3
            o = v4g2(t[..., :cc] * scale, t[..., cc:2 * cc], t[..., 2 * cc:],
                     full_bias)
            return o

        try:
            bench("v4g2", jax.jit(lambda x: chain(pal4, x, iters)), qkv, iters)
        except Exception as e:
            print(f"  v4g2 FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
