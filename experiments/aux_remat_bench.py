"""Measure the aux FER train step (Swin fwd+bwd+AdamW) with and without
per-block remat.

Remat (SwinConfig.remat, default True) trades one extra forward recompute in
the backward for not storing per-block activations.  The aux step at batch
150 may fit HBM without it — if so, the backward skips the recompute and the
step should gain roughly a forward's worth of time.

Run on the real chip:  python experiments/aux_remat_bench.py [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def one_variant(remat: bool, batch: int):
    import dataclasses

    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline
    from facialmmt_tpu.train.optim import MultiTaskState, make_optimizer
    from facialmmt_tpu.train.steps import make_aux_train_step

    base = FacialMMTConfig()
    cfg = dataclasses.replace(base, swin=dataclasses.replace(
        base.swin, remat=remat))
    model = FacialMMTPipeline(cfg, dtype=jnp.bfloat16)

    s = cfg.data.swin_img_size
    images = jax.jit(lambda k: jax.random.normal(
        k, (batch, s, s, 3)))(jax.random.PRNGKey(0))
    labels = jax.jit(lambda k: jax.random.randint(
        k, (batch,), 0, cfg.num_labels))(jax.random.PRNGKey(1))

    from __graft_entry__ import _make_batch
    mm_batch = _make_batch(cfg, b=2, utts_per_dia=2, faces_per_utt=2)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(2), "gumbel": jax.random.PRNGKey(3)},
        mm_batch)

    opt_cfg = cfg.optim
    swin_tx = make_optimizer(opt_cfg, opt_cfg.aux_lr, 1000)
    mm_tx = make_optimizer(opt_cfg, opt_cfg.trg_lr, 1000,
                           opt_cfg.weight_decay)
    state = MultiTaskState.create(variables["params"],
                                  variables["batch_stats"], swin_tx, mm_tx)
    step = jax.jit(make_aux_train_step(model, swin_tx), donate_argnums=(0,))

    state, loss = step(state, images, labels, jax.random.PRNGKey(4))
    float(loss)  # compile + warmup sync

    best = 0.0
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(6):
            state, loss = step(state, images, labels,
                               jax.random.fold_in(jax.random.PRNGKey(5),
                                                  w * 10 + i))
        float(loss)
        best = max(best, batch * 6 / (time.perf_counter() - t0))
    print(f"remat={remat}: {best:7.1f} img/s (batch {batch})", flush=True)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    print(f"backend: {jax.default_backend()}", flush=True)
    for remat in (True, False):
        try:
            one_variant(remat, batch)
        except Exception as e:  # OOM expected possibility for remat=False
            print(f"remat={remat}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
