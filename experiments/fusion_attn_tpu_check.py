"""Drive the new fused-attention wiring (ops/encoder.py SelfAttention +
ops/crossmodal.py PackedMultiheadAttention) on the real TPU chip: numerics
fused-vs-XLA at production shapes, plus chained-jit timings (one jit, fori
chain, single readback — CLAUDE.md measurement hygiene).

Run: setsid nohup python experiments/fusion_attn_tpu_check.py \
       > /tmp/fusion_attn_check.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

ITERS = 16


def timed(run, n=ITERS):
    run()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)

    from facialmmt_tpu.config import EncoderConfig
    from facialmmt_tpu.ops.crossmodal import CrossModalTransformerEncoder
    from facialmmt_tpu.ops.encoder import UttTransEncoder

    key = jax.random.PRNGKey(0)

    # ---- audio tower shape: B=128 utterances, S=157, h=768, 5 layers ----
    for (name, s, layers) in (("audio(S=157,5L)", 157, 5),
                              ("vision(S=32,2L)", 32, 2)):
        x = jax.jit(lambda k: jax.random.normal(
            k, (128, s, 768), jnp.bfloat16))(key)
        mask = jnp.ones((128, s), jnp.float32)
        outs = {}
        for mode in ("off", "auto"):
            cfg = EncoderConfig(fused_attention=mode)
            enc = UttTransEncoder(cfg, num_layers=layers, max_len=s,
                                  dtype=jnp.bfloat16)
            params = jax.jit(enc.init)(key, x, mask)

            @jax.jit
            def chain(p, x, mask):
                def body(i, carry):
                    out = enc.apply(p, x + carry * 1e-9, mask)
                    return jnp.sum(out).astype(jnp.float32) * 1e-9
                return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
            t = timed(lambda: float(chain(params, x, mask)))
            out = jax.jit(enc.apply)(params, x, mask)
            outs[mode] = out
            print(f"{name} {mode:4s}: {t:7.2f} ms/iter", flush=True)
        d = jnp.max(jnp.abs(outs["off"].astype(jnp.float32)
                            - outs["auto"].astype(jnp.float32)))
        m = jnp.max(jnp.abs(outs["off"].astype(jnp.float32)))
        print(f"{name} max|delta| {float(d):.4f} (max|out| {float(m):.2f})",
              flush=True)

    # ---- crossmodal: T(38) x A(157), 2 layers, h=768 ----
    xq = jax.jit(lambda k: jax.random.normal(
        k, (128, 38, 768), jnp.bfloat16))(key)
    xk = jax.jit(lambda k: jax.random.normal(
        k, (128, 157, 768), jnp.bfloat16))(key)
    outs = {}
    for mode in ("off", "auto"):
        enc = CrossModalTransformerEncoder(
            embed_dim=768, num_heads=12, layers=2, fused_attention=mode,
            max_positions=256, dtype=jnp.bfloat16)
        params = jax.jit(enc.init)(key, xq, xk, xk)

        @jax.jit
        def chain(p, xq, xk):
            def body(i, carry):
                out = enc.apply(p, xq + carry * 1e-9, xk + carry * 1e-9,
                                xk + carry * 1e-9)
                return jnp.sum(out).astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
        t = timed(lambda: float(chain(params, xq, xk)))
        outs[mode] = jax.jit(enc.apply)(params, xq, xk, xk)
        print(f"crossmodal T38xA157 {mode:4s}: {t:7.2f} ms/iter", flush=True)
    d = jnp.max(jnp.abs(outs["off"].astype(jnp.float32)
                        - outs["auto"].astype(jnp.float32)))
    m = jnp.max(jnp.abs(outs["off"].astype(jnp.float32)))
    print(f"crossmodal max|delta| {float(d):.4f} (max|out| {float(m):.2f})",
          flush=True)


if __name__ == "__main__":
    main()
