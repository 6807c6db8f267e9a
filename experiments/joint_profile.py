"""Where does the JOINT-training step's time go? (swin_from_target=True)

Joint training (the reference's actual from-scratch loop, train.py:46-152:
target-task gradients flow into Swin) runs at ~65 utt/s vs 125 utt/s for the
stop-grad step — this decomposes one grad-bearing microbatch (batch 32 =
256 packed faces + 4 dialogues, bench's joint shape) to find where the extra
time goes and whether the stage-3 XLA-autodiff fallback is worth attacking.

MEASURED (v5e-1, 2026-08-18, 'auto_grad' backward kernels on):
    grad_joint (swin bwd ON):   464.2 ms
    grad_stop  (swin bwd OFF):  232.0 ms  -> swin backward 232 ms (50%)
    swin fwd (256 faces):        98.6 ms  (21%; fwd+bwd = 71% of the step)
    text fwd+bwd (4 dia):        52.9 ms  (11%; ~82 TFLOP/s — AT the chip's
                                           measured matmul ceiling)
    optimizer update:            17.5 ms  (amortized once per accum-4 step)
    residual (fusion/filter/losses): ~80 ms (17%)
    accum-4 model: 4 x 464.2 + 17.5 = 1874 ms -> 68.3 utt/s (bench: 65.6;
    the 4% gap is host-side batch staging + dispatch)
Reading: the joint step is Swin-bound at ~10-11 TFLOP/s (49-token-window
shapes), with the backward at 2.35x the forward — at the flash-recompute
floor for stages 0-2.  The only XLA-autodiff remnant is stage 3 (both block
halves), bounded above by ~15-20 ms of the 232 -> a stage-3 backward kernel
is worth at most ~3-4% of the step.

Method: same hoist-safe harness as step_profile.py — every component is a
fori_loop chain inside ONE jit whose carry perturbs that component's OWN
input (XLA hoists loop-invariant subgraphs; see experiments/dispatch_cost.py).
Params/batch ride as explicit jit args (tunnel remote_compile rejects large
captured constants).

Components:
  * grad_joint — value_and_grad of the real multimodal loss,
                 swin_from_target=True ('auto_grad' Pallas backwards engaged)
  * grad_stop  — same loss with stop_swin_gradient=True; the difference
                 grad_joint - grad_stop is the Swin BACKWARD cost as it
                 occurs in the real step (Swin forward runs in both)
  * swin_fwd   — fer_probs forward alone (train-mode forward kernels)
  * text_grad  — text tower value_and_grad alone
  * update     — swin_tx + mm_tx AdamW update with precomputed grads

DCE trap (cost a first version of this file a 60x under-measurement): the
loop carry must consume EVERY grad leaf.  Consuming only
`jax.tree.leaves(grads)[0]` (a 'multimodal' leaf — alphabetically first)
lets XLA dead-code-eliminate the entire Swin backward, and consuming one
AdamW update leaf eliminates the per-leaf optimizer math for all others.
`_consume` below reduces every leaf into the carry.

Run: setsid nohup python experiments/joint_profile.py [batch] [stages] \
       > /tmp/joint_prof.log 2>&1 &
     stages: comma list of grad,swin,text,update (default all)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

ITERS = 8


def timed(run, n=ITERS):
    run()  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def _consume(tree):
    """Reduce every leaf into one f32 scalar so nothing is DCE-able."""
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(leaf.astype(jnp.float32))
               for leaf in jax.tree.leaves(tree))


def main(batch=32, stages=("grad", "swin", "text", "update")):
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline
    from facialmmt_tpu.train.optim import make_optimizer
    from facialmmt_tpu.train.steps import cross_entropy

    cfg = FacialMMTConfig()
    # remat ablation knobs (defaults now 'auto': off at these shapes) —
    # block-level remat re-runs the Swin/text forward in the backward ON TOP
    # of the flash kernels' internal recompute; measured at 256 faces:
    # grad_joint 453 (both on) -> 383 (swin off) -> 360 ms (both off)
    v = os.environ.get("SWIN_REMAT")
    if v is not None:
        cfg = dataclasses.replace(cfg, swin=dataclasses.replace(
            cfg.swin, remat=bool(int(v))))
    v = os.environ.get("TEXT_REMAT")
    if v is not None:
        cfg = dataclasses.replace(cfg, text=dataclasses.replace(
            cfg.text, remat=bool(int(v))))
    print(f"swin remat={cfg.swin.remat} text remat={cfg.text.remat}",
          flush=True)
    model = FacialMMTPipeline(cfg, dtype=jnp.bfloat16)
    batch_d = _make_batch(cfg, b=batch, utts_per_dia=8, faces_per_utt=8)
    batch_d["labels"] = jnp.zeros((batch,), jnp.int32)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch_d)
    params, batch_stats = variables["params"], variables["batch_stats"]
    key = jax.random.PRNGKey(2)
    n_faces = batch_d["faces"].shape[0]
    print(f"backend: {jax.default_backend()}, train batch {batch} "
          f"({n_faces} faces, {batch_d['dia_input_ids'].shape[0]} "
          f"dialogues x 512)", flush=True)

    def loss_fn(params, batch_stats, batch, stop_swin):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, _ = model.apply(
            variables, batch, deterministic=False,
            stop_swin_gradient=stop_swin,
            rngs={"gumbel": key, "dropout": jax.random.fold_in(key, 1)},
            mutable=["batch_stats"])
        return cross_entropy(logits, batch["labels"])

    def make_grad_chain(stop_swin):
        grad_fn = jax.value_and_grad(
            lambda p, s, b: loss_fn(p, s, b, stop_swin))

        @jax.jit
        def chain(params, batch_stats, batch, carry):
            def body(i, carry):
                b = dict(batch)
                b["faces"] = b["faces"] + carry * 1e-9
                b["audio_inputs"] = b["audio_inputs"] + carry * 1e-9
                # perturb the word-embedding table too: int input_ids can't
                # carry the data dependency, and without it XLA hoists the
                # whole text-tower FORWARD out of the loop
                p = jax.tree.map(lambda x: x, params)
                emb = p["multimodal"]["text_encoder"]["word_embeddings"]
                emb["embedding"] = emb["embedding"] + carry * 1e-9
                loss, grads = grad_fn(p, batch_stats, b)
                return (loss + _consume(grads)) * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, carry)
        return chain

    t_joint = None
    if "grad" in stages:
        joint_chain = make_grad_chain(False)
        t_joint = timed(lambda: float(joint_chain(params, batch_stats,
                                                  batch_d, jnp.float32(0))))
        print(f"grad_joint (swin bwd ON):  {t_joint:7.2f} ms", flush=True)

        stop_chain = make_grad_chain(True)
        t_stop = timed(lambda: float(stop_chain(params, batch_stats, batch_d,
                                                jnp.float32(0))))
        print(f"grad_stop  (swin bwd OFF): {t_stop:7.2f} ms", flush=True)
        print(f"  -> swin backward:        {t_joint - t_stop:7.2f} ms "
              f"({100 * (t_joint - t_stop) / t_joint:.0f}% of joint grad)",
              flush=True)

    # ---- swin forward alone (train-mode kernels) ----
    if "swin" in stages:
        @jax.jit
        def swin_chain(variables, faces, carry):
            def body(i, carry):
                probs, _ = model.apply(
                    variables, faces + carry * 1e-9,
                    method="fer_probs", deterministic=False,
                    mutable=["batch_stats"],
                    rngs={"gumbel": key,
                          "dropout": jax.random.fold_in(key, 1)})
                return jnp.sum(probs).astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, carry)

        t_swin_fwd = timed(lambda: float(swin_chain(
            variables, batch_d["faces"], jnp.float32(0))))
        print(f"swin fwd ({n_faces} faces): {t_swin_fwd:7.2f} ms", flush=True)

    # ---- text tower grad alone (sub-tree of the SAME pipeline params, so
    # no second roberta-large rides HBM and the weights match grad_joint) ----
    if "text" in stages:
        from facialmmt_tpu.config import resolve_text_config
        from facialmmt_tpu.models.text_encoder import TextEncoder

        text_model = TextEncoder(resolve_text_config(cfg), dtype=jnp.bfloat16)
        tparams = params["multimodal"]["text_encoder"]

        def text_loss(tp, nudge, ids, mask):
            # hoist-safe: perturb the embedding TABLE (int ids can't carry the
            # data dependency, and without it XLA hoists the whole forward)
            tp = dict(tp)
            we = dict(tp["word_embeddings"])
            we["embedding"] = we["embedding"] + nudge
            tp["word_embeddings"] = we
            out = text_model.apply({"params": tp}, ids, mask,
                                   deterministic=False,
                                   rngs={"dropout": jax.random.fold_in(key, 2)})
            return jnp.sum(out.astype(jnp.float32)) * 1e-9

        text_grad_fn = jax.value_and_grad(text_loss)

        @jax.jit
        def text_chain(tp, ids, mask, carry):
            def body(i, carry):
                loss, grads = text_grad_fn(tp, carry * 1e-9, ids, mask)
                return (loss + _consume(grads)) * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, carry)

        t_text = timed(lambda: float(text_chain(
            tparams, batch_d["dia_input_ids"], batch_d["dia_input_mask"],
            jnp.float32(0))))
        print(f"text fwd+bwd ({batch_d['dia_input_ids'].shape[0]} dia): "
              f"{t_text:7.2f} ms", flush=True)

    # ---- full fusion grad (text tower + crossmodal + heads + losses) with
    # PRECOMPUTED face probs: isolates everything downstream of Swin.
    # fusion-minus-text ~= the crossmodal/filter/loss residual ----
    if "fusion" in stages:
        batch_p = dict(batch_d)
        probs0, _ = jax.jit(
            lambda v, f: model.apply(v, f, method="fer_probs",
                                     mutable=["batch_stats"],
                                     rngs={"gumbel": key}))(
                {"params": params, "batch_stats": batch_stats},
                batch_d["faces"])
        batch_p["face_probs"] = probs0

        def fusion_loss(params, batch_stats, batch):
            variables = {"params": params, "batch_stats": batch_stats}
            logits, _ = model.apply(
                variables, batch, deterministic=False,
                stop_swin_gradient=False,
                rngs={"gumbel": key, "dropout": jax.random.fold_in(key, 1)},
                mutable=["batch_stats"])
            return cross_entropy(logits, batch["labels"])

        fusion_grad_fn = jax.value_and_grad(fusion_loss)

        @jax.jit
        def fusion_chain(params, batch_stats, batch, carry):
            def body(i, carry):
                b = dict(batch)
                b["face_probs"] = b["face_probs"] + carry * 1e-9
                b["audio_inputs"] = b["audio_inputs"] + carry * 1e-9
                p = jax.tree.map(lambda x: x, params)
                emb = p["multimodal"]["text_encoder"]["word_embeddings"]
                emb["embedding"] = emb["embedding"] + carry * 1e-9
                loss, grads = fusion_grad_fn(p, batch_stats, b)
                return (loss + _consume(grads)) * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, carry)

        t_fusion = timed(lambda: float(fusion_chain(
            params, batch_stats, batch_p, jnp.float32(0))))
        print(f"fusion grad (precomp probs): {t_fusion:7.2f} ms "
              f"(incl. text tower; minus text = crossmodal/filter/losses)",
              flush=True)

    # ---- optimizer update with precomputed grads ----
    if "update" in stages:
        opt = cfg.optim
        swin_tx = make_optimizer(opt, opt.aux_lr, 1000)
        mm_tx = make_optimizer(opt, opt.trg_lr, 1000, opt.weight_decay)
        grad_fn = jax.value_and_grad(lambda p, s, b: loss_fn(p, s, b, False))
        _, grads0 = jax.jit(grad_fn)(params, batch_stats, batch_d)
        swin_os = swin_tx.init(params["swin_model"])
        mm_os = mm_tx.init(params["multimodal"])

        @jax.jit
        def update_chain(params, grads, swin_os, mm_os, carry):
            def body(i, carry):
                g = jax.tree.map(lambda x: x + carry * 1e-9, grads)
                mm_u, _ = mm_tx.update(g["multimodal"], mm_os,
                                       params["multimodal"])
                sw_u, _ = swin_tx.update(g["swin_model"], swin_os,
                                         params["swin_model"])
                return (_consume(mm_u) + _consume(sw_u)) * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, carry)

        t_update = timed(lambda: float(update_chain(params, grads0, swin_os,
                                                    mm_os, jnp.float32(0))))
        print(f"optimizer update:          {t_update:7.2f} ms", flush=True)

        if t_joint is not None:
            print(f"\naccum-4 step model: 4 x grad_joint + update = "
                  f"{4 * t_joint + t_update:.1f} ms -> "
                  f"{4 * batch * 1e3 / (4 * t_joint + t_update):.1f} utt/s "
                  f"(bench.py joint: ~65.6)", flush=True)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    st = tuple(sys.argv[2].split(",")) if len(sys.argv) > 2 else (
        "grad", "swin", "text", "update")
    main(b, st)
