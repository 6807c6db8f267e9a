"""Decompose the SwinBlock-vs-raw-kernels gap (block_overhead.py: 19.5 ms
block.apply at shift=0 vs 14.4 ms for its two kernels timed alone).

All variants use the IDENTICAL x=f(x) fori_loop chain + one readback, so any
difference is the variant, not the harness:
  kernels   — fused_attention_block + fused_ln_mlp_residual, bias precomputed
  kernels+b — same, but the rel-pos bias gather/transpose rebuilt in-loop
              (what SwinBlock does per call)
  block     — SwinBlock.apply (shift=0 / shift=3)
  perm-only — the two jnp.take row gathers of the shifted path, alone

Run: python experiments/block_gap.py [faces]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

ITERS = 16


def timed(jitted, x):
    out = jitted(x)
    import jax.numpy as jnp
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jitted(x)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3


def main(faces=256):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facialmmt_tpu.ops.pallas.block_mlp import fused_ln_mlp_residual
    from facialmmt_tpu.ops.pallas.fused_block import fused_attention_block
    from facialmmt_tpu.ops.swin import (SwinBlock, relative_position_index,
                                        shifted_window_perms)

    grid, c, h = 56, 96, 3
    ws, n = 7, 49
    b, l = faces, grid * grid
    w_total = b * l // n
    hid = 4 * c
    rng = np.random.default_rng(0)
    x = jax.jit(lambda k: jax.random.normal(k, (b, l, c), jnp.bfloat16))(
        jax.random.PRNGKey(0))
    print(f"backend: {jax.default_backend()}, {faces} faces, stage0 shapes",
          flush=True)

    g1 = jnp.asarray(rng.normal(size=(c,)) * 0.02 + 1, jnp.float32)
    b1 = jnp.zeros((c,), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.02, jnp.float32)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.02, jnp.float32)
    bproj = jnp.zeros((c,), jnp.float32)
    table = jnp.asarray(rng.normal(size=(169, h)) * 0.02, jnp.float32)
    idx = jnp.asarray(relative_position_index(ws))
    g2 = jnp.asarray(rng.normal(size=(c,)) * 0.02 + 1, jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, hid)) * 0.02, jnp.float32)
    bb1 = jnp.zeros((hid,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(hid, c)) * 0.02, jnp.float32)
    bb2 = jnp.zeros((c,), jnp.float32)

    bias_pre = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)[None]

    def two_kernels(x, bias):
        y = fused_attention_block(x.reshape(w_total, n, c), g1, b1, wqkv,
                                  bqkv, wproj, bproj, bias, None)
        return fused_ln_mlp_residual(y.reshape(-1, c), g2, b2, w1, bb1, w2,
                                     bb2, None).reshape(x.shape)

    def chain(body):
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(
                0, ITERS, lambda _, x: (body(x) * 0.5).astype(x.dtype), x)
        return f

    t = timed(chain(lambda x: two_kernels(x, bias_pre)), x)
    print(f"kernels (bias precomputed): {t:7.2f} ms", flush=True)

    def with_bias(x):
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)[None]
        return two_kernels(x, bias)

    t = timed(chain(with_bias), x)
    print(f"kernels + in-loop bias:     {t:7.2f} ms", flush=True)

    for shift in (0, 3):
        block = SwinBlock(dim=c, input_resolution=(grid, grid), num_heads=h,
                          window_size=ws, shift_size=shift, drop_path=0.0,
                          fused_attention="auto", fused_mlp="auto",
                          dtype=jnp.bfloat16)
        params = jax.jit(block.init, static_argnums=(2,))(
            jax.random.PRNGKey(0), x, True)["params"]
        t = timed(chain(lambda x: block.apply({"params": params}, x,
                                              deterministic=True)), x)
        print(f"block.apply shift={shift}:        {t:7.2f} ms", flush=True)

    perm, inv = shifted_window_perms(grid, grid, ws, 3)
    perm, inv = jnp.asarray(perm), jnp.asarray(inv)

    def perms_only(x):
        return jnp.take(jnp.take(x, perm, axis=1), inv, axis=1)

    t = timed(chain(perms_only), x)
    print(f"perm + inverse perm only:   {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
