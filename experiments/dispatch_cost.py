"""Tunnel dispatch cost vs in-jit chaining at the bench's eval shapes.

Hypothesis: each jit dispatch over the axon tunnel costs far more than the
ledger's ~4.7 ms when the argument tree is large (the eval step takes the
full variables pytree: ~600 leaves).  Compares the SAME 8-step serialized
eval window (a) as 8 Python-level jit dispatches (bench.py's shape) vs (b) as
one jit with a lax.fori_loop chain (step_profile.py's shape).

Run: python experiments/dispatch_cost.py [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

ITERS = 8


def main(batch=128):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline

    cfg = FacialMMTConfig()
    model = FacialMMTPipeline(cfg, dtype=jnp.bfloat16)
    batch_d = _make_batch(cfg, b=batch, utts_per_dia=8, faces_per_utt=8)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch_d)
    key = jax.random.PRNGKey(2)
    print(f"backend: {jax.default_backend()}, batch {batch}", flush=True)

    @jax.jit
    def one_step(variables, batch, carry):
        b = dict(batch)
        b["audio_inputs"] = b["audio_inputs"] + carry * 1e-9
        logits = model.apply(variables, b, rngs={"gumbel": key})
        return jnp.sum(logits).astype(jnp.float32)

    def window_dispatch():
        c = jnp.float32(0)
        for _ in range(ITERS):
            c = one_step(variables, batch_d, c)
        float(c)

    @jax.jit
    def window_fused(variables, batch, carry):
        def body(i, carry):
            b = dict(batch)
            b["audio_inputs"] = b["audio_inputs"] + carry * 1e-9
            logits = model.apply(variables, b, rngs={"gumbel": key})
            return jnp.sum(logits).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, carry)

    def run_fused():
        float(window_fused(variables, batch_d, jnp.float32(0)))

    for name, fn in (("8x python dispatch", window_dispatch),
                     ("1x jit(fori x8)   ", run_fused)):
        fn()  # compile + warmup
        best = min((lambda t0: (fn(), time.perf_counter() - t0)[1])(
            time.perf_counter()) for _ in range(3))
        print(f"{name}: {best / ITERS * 1e3:7.2f} ms/step "
              f"({batch * ITERS / best:7.1f} utt/s)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
