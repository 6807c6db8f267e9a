"""Decompose the fusion residual (everything downstream of Swin).

joint_profile.py measured the full fusion grad (precomputed face probs) at
137.9 ms per batch-32 microbatch — 53 ms of it is the text tower, leaving
~85 ms of towers/crossmodal/filter/heads/losses running at ~28 TFLOP/s
(utils/flops.py accounting), ~1/3 of the text tower's 82 TFLOP/s.  This
script separates:

  * fwd_eval   — fusion forward, deterministic (no dropout)
  * fwd_train  — fusion forward, train mode (dropout RNG + masks live)
  * grad_train — fusion fwd+bwd train mode (joint_profile's 137.9 ms shape)

fwd_train - fwd_eval   = the dropout/threefry cost (forward side)
grad_train / fwd_train = the backward multiple (healthy ~2-2.5x with
                         saved activations; >3.5x means XLA layout trouble)

Hoist-safe harness per CLAUDE.md: fori_loop chains inside one jit, carry
perturbs the embedding table + float inputs, every grad leaf consumed.

Run: setsid nohup python experiments/fusion_profile.py > /tmp/fusion_prof.log 2>&1 &
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


def _consume(tree):
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(leaf.astype(jnp.float32))
               for leaf in jax.tree.leaves(tree))


def main(batch=32, prng="threefry2x32"):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline
    from facialmmt_tpu.train.steps import cross_entropy

    cfg = FacialMMTConfig()
    model = FacialMMTPipeline(cfg, dtype=jnp.bfloat16)
    batch_d = _make_batch(cfg, b=batch, utts_per_dia=8, faces_per_utt=8)
    batch_d["labels"] = jnp.zeros((batch,), jnp.int32)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch_d)
    params, batch_stats = variables["params"], variables["batch_stats"]
    key = jax.random.key(2, impl=prng)
    probs0, _ = jax.jit(
        lambda v, f: model.apply(v, f, method="fer_probs",
                                 mutable=["batch_stats"],
                                 rngs={"gumbel": key}))(variables,
                                                        batch_d["faces"])
    batch_d["face_probs"] = probs0
    print(f"backend: {jax.default_backend()}, batch {batch}, "
          f"{batch_d['dia_input_ids'].shape[0]} dialogues, prng={prng}",
          flush=True)

    def fwd(params, batch_stats, batch, det, rng_key):
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"gumbel": rng_key}
        if not det:
            rngs["dropout"] = jax.random.fold_in(rng_key, 1)
        logits, _ = model.apply(variables, batch, deterministic=det,
                                stop_swin_gradient=False, rngs=rngs,
                                mutable=["batch_stats"])
        return cross_entropy(logits, batch["labels"])

    def make_fwd_chain(det):
        @jax.jit
        def chain(params, batch_stats, batch, carry):
            def body(i, carry):
                b = dict(batch)
                b["face_probs"] = b["face_probs"] + carry * 1e-9
                b["audio_inputs"] = b["audio_inputs"] + carry * 1e-9
                p = jax.tree.map(lambda x: x, params)
                emb = p["multimodal"]["text_encoder"]["word_embeddings"]
                emb["embedding"] = emb["embedding"] + carry * 1e-9
                return fwd(p, batch_stats, b, det,
                           jax.random.fold_in(key, i)) * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, carry)
        return chain

    for det, name in ((True, "fwd_eval  (no dropout)"),
                      (False, "fwd_train (dropout on)")):
        chain = make_fwd_chain(det)
        t = timed(lambda c=chain: float(c(params, batch_stats, batch_d,
                                          jnp.float32(0))))
        print(f"{name}: {t:7.2f} ms", flush=True)

    grad_fn = jax.value_and_grad(
        lambda p, s, b, k: fwd(p, s, b, False, k))

    @jax.jit
    def grad_chain(params, batch_stats, batch, carry):
        def body(i, carry):
            b = dict(batch)
            b["face_probs"] = b["face_probs"] + carry * 1e-9
            b["audio_inputs"] = b["audio_inputs"] + carry * 1e-9
            p = jax.tree.map(lambda x: x, params)
            emb = p["multimodal"]["text_encoder"]["word_embeddings"]
            emb["embedding"] = emb["embedding"] + carry * 1e-9
            loss, grads = grad_fn(p, batch_stats, b, jax.random.fold_in(key, i))
            return (loss + _consume(grads)) * 1e-9
        return jax.lax.fori_loop(0, ITERS, body, carry)

    t = timed(lambda: float(grad_chain(params, batch_stats, batch_d,
                                       jnp.float32(0))))
    print(f"grad_train (fwd+bwd):  {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         sys.argv[2] if len(sys.argv) > 2 else "threefry2x32")
