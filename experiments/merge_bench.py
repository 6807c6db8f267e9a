"""Swin plumbing slice (VERDICT r3 next #7): can the stage-transition chain
window_reverse -> 2x2 patch-merge gather -> LN -> (4C->2C) matmul ->
window_partition be cheaper than its current XLA form?

Variants, per stage transition (identical fori-chain harness, one jit,
single readback — block_gap.py-grade):

  A. `model`   — the current module chain exactly as SwinTransformer runs it
                 (window_reverse + PatchMerging + next window_partition).
  B. `gather1` — ONE precomputed static row-gather that maps window-resident
                 stage-s rows DIRECTLY to the (L/4, 4C) concat layout of
                 stage s+1's window-resident order, then LN + matmul.
                 Replaces 3 transpose/copy chains with one jnp.take.
  C. `pallas`  — variant B's gather + a Pallas LN+matmul kernel (block_mlp-
                 style: LN stats fp32 in VMEM, weight resident) in place of
                 XLA's LN+dot.

Run: setsid nohup python experiments/merge_bench.py > /tmp/merge_bench.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

ITERS = 8


def timed(run, n=ITERS):
    run()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main(faces=256):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facialmmt_tpu.config import SwinConfig
    # measure the PRODUCTION gather index (its equivalence to the module
    # chain is pinned by tests/test_swin_layout.py), not a local re-derivation
    # that could drift from what the model actually runs
    from facialmmt_tpu.ops.swin import (PatchMerging, merge_gather_index,
                                        window_partition, window_reverse)

    print("backend:", jax.default_backend(), flush=True)
    cfg = SwinConfig()
    key = jax.random.PRNGKey(0)

    for stage in range(3):
        sh = sw = cfg.img_size // cfg.patch_size // (2 ** stage)
        c = cfg.embed_dim * 2 ** stage
        ws = min(cfg.window_size, sh)
        ws_n = min(cfg.window_size, sh // 2)
        b = faces
        x = jax.jit(lambda k: jax.random.normal(
            k, (b, sh * sw, c), jnp.bfloat16))(key)

        merge = PatchMerging((sh, sw), c, dtype=jnp.bfloat16)
        params = jax.jit(merge.init)(key, x)
        w_red = params["params"]["reduction"]["kernel"]
        ln_s = params["params"]["norm"]["scale"]
        ln_b = params["params"]["norm"]["bias"]

        gidx = jnp.asarray(merge_gather_index(sh, sw, ws, ws_n))

        def variant_model(x):
            nw_cnt = (sh * sw) // (ws * ws)
            y = window_reverse(x.reshape(b * nw_cnt, ws * ws, c), ws, sh, sw)
            y = merge.apply(params, y.reshape(b, sh * sw, c))
            nh2 = sh // 2
            y = window_partition(y.reshape(b, nh2, nh2, 2 * c), ws_n)
            return y.reshape(b, (nh2 * nh2), 2 * c)

        def gathered(x):
            g = jnp.take(x, gidx.reshape(-1), axis=1)      # (b, L/4*4, c)
            return g.reshape(b, (sh // 2) * (sw // 2), 4 * c)

        def ln_mat(g):
            gf = g.astype(jnp.float32)
            mu = gf.mean(-1, keepdims=True)
            var = gf.var(-1, keepdims=True)
            n = (gf - mu) * jax.lax.rsqrt(var + 1e-5)
            n = n * ln_s + ln_b
            return jnp.dot(n.astype(jnp.bfloat16), w_red.astype(jnp.bfloat16),
                           preferred_element_type=jnp.bfloat16)

        def variant_gather1(x):
            return ln_mat(gathered(x))

        from facialmmt_tpu.ops.pallas.merge_kernel import fused_merge
        def variant_pallas(x):
            return fused_merge(gathered(x), ln_s, ln_b, w_red)

        outs = {}
        for name, fn in (("model", variant_model),
                         ("gather1", variant_gather1),
                         ("pallas", variant_pallas)):
            try:
                @jax.jit
                def chain(x, fn=fn):
                    def body(i, carry):
                        out = fn(x + carry * 1e-9)
                        return jnp.sum(out).astype(jnp.float32) * 1e-9
                    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
                t = timed(lambda: float(chain(x)))
                outs[name] = jax.jit(fn)(x)
                print(f"stage{stage}->{stage+1} ({b}f, {sh}x{sw}x{c}) "
                      f"{name:8s}: {t:7.2f} ms", flush=True)
            except Exception as e:
                print(f"stage{stage}->{stage+1} {name}: FAILED {type(e).__name__} {e}",
                      flush=True)
        if "model" in outs and "gather1" in outs:
            d = float(jnp.max(jnp.abs(outs["model"].astype(jnp.float32)
                                      - outs["gather1"].astype(jnp.float32))))
            print(f"  model-vs-gather1 max|delta| {d:.5f}", flush=True)
        if "gather1" in outs and "pallas" in outs:
            d = float(jnp.max(jnp.abs(outs["pallas"].astype(jnp.float32)
                                      - outs["gather1"].astype(jnp.float32))))
            print(f"  gather1-vs-pallas max|delta| {d:.5f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
