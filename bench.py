"""Benchmark: flagship T+A+V inference throughput on one TPU chip.

Measures the fully-fused eval step — Swin-tiny FER over every face, gumbel +
frame-importance filter, RoBERTa-large-architecture dialogue encoder over 512
tokens, 768-d crossmodal fusion — in utterances/sec on the real chip.

Baseline: the reference publishes no throughput (BASELINE.md); it runs batch=1
on one RTX 3090Ti with fp16, recomputing the full RoBERTa-large dialogue pass
per utterance plus Swin over each face with per-face Python/cv2 preprocessing
(reference train.py:154-243, SURVEY.md §3.1).  We estimate that loop at
~10 utt/s on its hardware (RoBERTa-large fwd at 512 tokens ~25ms fp16 + Swin over
~4 faces ~15ms + per-face host preprocessing); vs_baseline reports measured/10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

REFERENCE_UTT_PER_SEC = 10.0  # single-3090Ti bs=1 estimate, see docstring


def main():
    import jax
    import jax.numpy as jnp

    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline
    from __graft_entry__ import _make_batch

    cfg = FacialMMTConfig()
    model = FacialMMTPipeline(cfg, dtype=jnp.bfloat16)

    # MELD test-set structure: ~9.3 utterances/dialogue (2610 utts / 280
    # dialogues), ~8 face crops per utterance.  The batch carries the unique
    # dialogues once (encode-once-gather-many) exactly as the real loader does.
    import os as _os
    batch_size = int(_os.environ.get("BENCH_BATCH", 64))
    batch = _make_batch(cfg, b=batch_size, utts_per_dia=8, faces_per_utt=8)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)

    @jax.jit
    def eval_step(variables, batch, key, carry):
        # carry folds the previous step's logits into this step's audio input:
        # a true data dependency that serializes steps, so the one host
        # readback at the end forces ALL device work to have completed.
        # (block_until_ready does not synchronize on the axon tunnel backend.)
        b = dict(batch)
        b["audio_inputs"] = b["audio_inputs"] + carry * 1e-9
        logits = model.apply(variables, b, rngs={"gumbel": key})
        return logits, jnp.sum(logits).astype(jnp.float32)

    key = jax.random.PRNGKey(2)
    # warmup / compile
    logits, carry = eval_step(variables, batch, key, jnp.float32(0))
    float(carry)  # host readback = real sync

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        logits, carry = eval_step(variables, batch,
                                  jax.random.fold_in(key, i), carry)
    float(carry)  # forces the whole chain
    dt = time.perf_counter() - t0

    utt_per_sec = batch_size * iters / dt
    print(json.dumps({
        "metric": "meld_tav_eval_throughput",
        "value": round(utt_per_sec, 2),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(utt_per_sec / REFERENCE_UTT_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
