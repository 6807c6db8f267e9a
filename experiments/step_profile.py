"""Where does the eval step's time go? Component-level timing at bench shapes.

Method: each component is timed as a fori_loop chain inside ONE jit, with the
loop carry perturbing that component's OWN input — XLA hoists loop-invariant
subgraphs out of fori_loop bodies (measured: a carry that touches only the
audio input lets XLA run Swin+text once for 8 "iterations", a 4.8x mirage
that would imply >100% MFU), so the carry must feed the inputs of exactly the
subgraph being measured.  Params/batch ride as EXPLICIT jit args (tunnel
remote_compile rejects large captured constants).

Components:
  * full   — the dispatched whole eval step (bench.py's shape: 8 Python-level
             dispatches, everything re-executed per step)
  * swin   — Swin FER over the packed faces (carry -> faces)
  * text   — text tower over the unique dialogues (carry -> input ids)
  * fusion — everything downstream of the towers: scatter, frame filter,
             audio/vision encoders, crossmodal, pooling (carry -> face_probs
             and audio; text hoists out)

Run: python experiments/step_profile.py [batch]
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
    n_faces = batch_d["faces"].shape[0]
    print(f"backend: {jax.default_backend()}, eval batch {batch} "
          f"({n_faces} faces, {batch_d['dia_input_ids'].shape[0]} "
          f"dialogues x 512)", flush=True)

    # ---- full step, dispatched (bench.py's shape: nothing hoists) ----
    @jax.jit
    def one_step(variables, batch, carry):
        b = dict(batch)
        b["audio_inputs"] = b["audio_inputs"] + carry * 1e-9
        logits = model.apply(variables, b, rngs={"gumbel": key})
        return jnp.sum(logits).astype(jnp.float32)

    def full_run():
        c = jnp.float32(0)
        for _ in range(ITERS):
            c = one_step(variables, batch_d, c)
        float(c)

    t_full = timed(full_run)
    print(f"full step (dispatched): {t_full:7.2f} ms", flush=True)

    # ---- swin over the packed faces (carry perturbs faces) ----
    @jax.jit
    def swin_chain(variables, faces, carry):
        def body(i, carry):
            probs = model.apply(variables, faces + carry * 1e-9,
                                method="fer_probs", rngs={"gumbel": key})
            return jnp.sum(probs).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, ITERS, body, carry)

    t_swin = timed(lambda: float(swin_chain(variables, batch_d["faces"],
                                            jnp.float32(0))))
    print(f"swin ({n_faces} faces):  {t_swin:7.2f} ms "
          f"({100 * t_swin / t_full:.0f}%)", flush=True)

    # ---- text tower (carry perturbs the ids data-dependently) ----
    from facialmmt_tpu.models.text_encoder import TextEncoder

    text_model = TextEncoder(cfg.text, dtype=jnp.bfloat16)
    tvars = jax.jit(text_model.init)(jax.random.PRNGKey(0),
                                     batch_d["dia_input_ids"],
                                     batch_d["dia_input_mask"])

    @jax.jit
    def text_chain(tvars, ids, mask, carry):
        def body(i, carry):
            # ids depend on carry in a way XLA cannot hoist (carry is a
            # runtime value), but that is a no-op for sane carries
            ids_i = jnp.where(carry > 1e30, ids + 1, ids)
            out = text_model.apply(tvars, ids_i, mask)
            return jnp.sum(out.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, ITERS, body, carry)

    t_text = timed(lambda: float(text_chain(
        tvars, batch_d["dia_input_ids"], batch_d["dia_input_mask"],
        jnp.float32(0))))
    print(f"text tower:            {t_text:7.2f} ms "
          f"({100 * t_text / t_full:.0f}%)", flush=True)

    # ---- fusion stack (carry perturbs face_probs + audio; Swin skipped via
    #      injected probs, text hoists out of the loop) ----
    probs0 = jnp.full((n_faces, cfg.num_labels), 1.0 / cfg.num_labels,
                      jnp.float32)

    @jax.jit
    def fusion_chain(variables, batch, probs0, carry):
        def body(i, carry):
            b = dict(batch)
            b["audio_inputs"] = b["audio_inputs"] + carry * 1e-9
            b["face_probs"] = probs0 + carry * 1e-9
            logits = model.apply(variables, b, rngs={"gumbel": key})
            return jnp.sum(logits).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, ITERS, body, carry)

    t_fusion = timed(lambda: float(fusion_chain(variables, batch_d, probs0,
                                                jnp.float32(0))))
    print(f"fusion (+text hoisted; text runs once/window adds "
          f"~{t_text / ITERS:.1f}): {t_fusion:7.2f} ms", flush=True)
    t_fusion_net = t_fusion - t_text / ITERS
    print(f"fusion net:            {t_fusion_net:7.2f} ms "
          f"({100 * t_fusion_net / t_full:.0f}%)", flush=True)
    print(f"sum(swin+text+fusion): {t_swin + t_text + t_fusion_net:7.2f} ms "
          f"vs full {t_full:.2f} (gap = dispatch+gather/scatter)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
