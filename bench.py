"""Benchmark: flagship T+A+V throughput on one TPU chip.

Two measurements, one JSON line:
  * value / metric         — EVAL throughput (utterances/sec) of the fully-
    fused eval step: Swin-tiny FER over every face, gumbel + frame-importance
    filter, RoBERTa-large-architecture dialogue encoder over 512 tokens, 768-d
    crossmodal fusion.
  * train_utt_per_sec      — TRAIN throughput of the full multi-task target
    step (forward + backward + AdamW; reference-semantics Swin coupling:
    target grads into Swin are discarded, realized as stop_gradient, so the
    Swin backward is skipped exactly as the reference's discard implies).

Baseline: the reference publishes no throughput (BASELINE.md carries the
component arithmetic); it runs batch=1 on one RTX 3090Ti with fp16,
recomputing the full RoBERTa-large dialogue pass per utterance plus Swin over
each face with per-face Python/cv2 preprocessing (reference train.py:154-243,
SURVEY.md §3.1).  BASELINE.md estimates that loop at ~10-17 utt/s; vs_baseline
divides by 10, the charitable (fast) end.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Measurement hygiene (CLAUDE.md): block_until_ready does not synchronize on the
axon tunnel backend, so steps chain through a data dependency and ONE host
readback at the end forces the full chain.  The dev tunnel time-shares the
chip across tenants (measured 2x swings between identical runs), so every
metric reports the best of several timing windows — the reproducible
uncontended throughput (timeit's min-time principle).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

REFERENCE_UTT_PER_SEC = 10.0  # single-3090Ti bs=1 estimate, see BASELINE.md


def _eval_throughput(jax, jnp, model, cfg, batch_size):
    from __graft_entry__ import _make_batch

    batch = _make_batch(cfg, b=batch_size, utts_per_dia=8, faces_per_utt=8)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)

    @jax.jit
    def eval_step(variables, batch, key, carry):
        # carry folds the previous step's logits into this step's audio input:
        # a true data dependency that serializes steps, so the one host
        # readback at the end forces ALL device work to have completed.
        b = dict(batch)
        b["audio_inputs"] = b["audio_inputs"] + carry * 1e-9
        logits = model.apply(variables, b, rngs={"gumbel": key})
        return logits, jnp.sum(logits).astype(jnp.float32)

    key = jax.random.PRNGKey(2)
    logits, carry = eval_step(variables, batch, key, jnp.float32(0))
    float(carry)  # host readback = real sync (compile + warmup)

    # best-of-N windows: the dev tunnel time-shares the chip, so a single
    # window can catch another tenant's burst (measured swings of 2x); the
    # fastest window is the reproducible uncontended number (timeit's
    # min-time principle)
    best = 0.0
    for w in range(3):
        iters = 8
        t0 = time.perf_counter()
        for i in range(iters):
            logits, carry = eval_step(variables, batch,
                                      jax.random.fold_in(key, w * 100 + i),
                                      carry)
        float(carry)
        dt = time.perf_counter() - t0
        best = max(best, batch_size * iters / dt)
    return best, variables


def _train_throughput(jax, jnp, model, cfg, variables, batch_size):
    from __graft_entry__ import _make_batch

    from facialmmt_tpu.config import OptimConfig
    from facialmmt_tpu.train.optim import MultiTaskState, make_optimizer
    from facialmmt_tpu.train.steps import make_multimodal_train_step

    batch = _make_batch(cfg, b=batch_size, utts_per_dia=8, faces_per_utt=8)
    opt_cfg = OptimConfig(warm_up=0.0)
    swin_tx = make_optimizer(opt_cfg, opt_cfg.aux_lr, 1000)
    mm_tx = make_optimizer(opt_cfg, opt_cfg.trg_lr, 1000,
                           opt_cfg.weight_decay)
    # the step donates its state; copy so `variables` stays live for the
    # other benchmarks
    state = MultiTaskState.create(
        jax.tree.map(jnp.copy, variables["params"]),
        jax.tree.map(jnp.copy, variables["batch_stats"]), swin_tx, mm_tx)
    step = jax.jit(make_multimodal_train_step(model, swin_tx, mm_tx),
                   donate_argnums=(0,))

    state, loss = step(state, batch, jax.random.PRNGKey(3))
    float(loss)  # compile + warmup sync

    best = 0.0
    for w in range(2):
        iters = 6
        t0 = time.perf_counter()
        for i in range(iters):
            # params chain step-to-step (donated state), serializing the
            # steps; the final loss readback syncs the chain
            state, loss = step(state, batch, jax.random.fold_in(
                jax.random.PRNGKey(4), w * 100 + i))
        float(loss)
        dt = time.perf_counter() - t0
        best = max(best, batch_size * iters / dt)
    return best


def _aux_throughput(jax, jnp, model, cfg, variables, batch_size):
    """Auxiliary FER task: Swin fwd+bwd+AdamW over Aff-Wild2-shaped image
    batches (reference train.py:15-42, bs=150 at main.py:55)."""
    from facialmmt_tpu.config import OptimConfig
    from facialmmt_tpu.train.optim import MultiTaskState, make_optimizer
    from facialmmt_tpu.train.steps import make_aux_train_step

    opt_cfg = OptimConfig(warm_up=0.0)
    swin_tx = make_optimizer(opt_cfg, opt_cfg.aux_lr, 1000)
    mm_tx = make_optimizer(opt_cfg, opt_cfg.trg_lr, 1000)
    state = MultiTaskState.create(
        jax.tree.map(jnp.copy, variables["params"]),
        jax.tree.map(jnp.copy, variables["batch_stats"]), swin_tx, mm_tx)
    step = jax.jit(make_aux_train_step(model, swin_tx), donate_argnums=(0,))

    s = cfg.data.swin_img_size
    images = jax.jit(lambda k: jax.random.normal(
        k, (batch_size, s, s, 3), jnp.float32))(jax.random.PRNGKey(5))
    labels = jax.jit(lambda k: jax.random.randint(
        k, (batch_size,), 0, cfg.num_labels))(jax.random.PRNGKey(6))

    state, loss = step(state, images, labels, jax.random.PRNGKey(7))
    float(loss)  # compile + warmup sync

    best = 0.0
    for w in range(2):
        iters = 6
        t0 = time.perf_counter()
        for i in range(iters):
            state, loss = step(state, images, labels,
                               jax.random.fold_in(jax.random.PRNGKey(8),
                                                  w * 100 + i))
        float(loss)
        dt = time.perf_counter() - t0
        best = max(best, batch_size * iters / dt)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline

    cfg = FacialMMTConfig()
    model = FacialMMTPipeline(cfg, dtype=jnp.bfloat16)

    # MELD test-set structure: ~9.3 utterances/dialogue (2610 utts / 280
    # dialogues), ~8 face crops per utterance.  The batch carries the unique
    # dialogues once (encode-once-gather-many) exactly as the real loader does.
    # Batch sweep (BASELINE.md): 64 -> 171-194 utt/s (dispatch-noise ±12%),
    # 128 -> 179 utt/s (stable ±0.2%), 256 -> OOM (2048 packed faces).  128 is
    # the knee and the stable default.
    eval_batch = int(os.environ.get("BENCH_BATCH", 128))
    train_batch = int(os.environ.get("BENCH_TRAIN_BATCH", 32))

    aux_batch = int(os.environ.get("BENCH_AUX_BATCH", 150))

    eval_utt_s, variables = _eval_throughput(jax, jnp, model, cfg, eval_batch)
    train_utt_s = _train_throughput(jax, jnp, model, cfg, variables,
                                    train_batch)
    aux_img_s = _aux_throughput(jax, jnp, model, cfg, variables, aux_batch)

    # auditable FLOPs accounting (utils/flops.py): model TFLOP/s + MFU at the
    # measured eval throughput, from the analytic per-batch MAC count of the
    # exact shapes benched here (8 utts/dialogue, 8 faces/utt)
    from facialmmt_tpu.utils.flops import V5E_BF16_PEAK_FLOPS, eval_step_macs

    macs = eval_step_macs(cfg, eval_batch, max(eval_batch // 8, 1),
                          8 * eval_batch)
    flops_per_sec = 2 * macs * eval_utt_s / eval_batch

    print(json.dumps({
        "metric": "meld_tav_eval_throughput",
        "value": round(eval_utt_s, 2),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(eval_utt_s / REFERENCE_UTT_PER_SEC, 2),
        "eval_batch": eval_batch,
        "train_utt_per_sec": round(train_utt_s, 2),
        "train_batch": train_batch,
        "aux_img_per_sec": round(aux_img_s, 2),
        "aux_batch": aux_batch,
        "model_tflops_per_sec": round(flops_per_sec / 1e12, 2),
        "mfu_vs_v5e_peak": round(flops_per_sec / V5E_BF16_PEAK_FLOPS, 4),
    }))


if __name__ == "__main__":
    main()
