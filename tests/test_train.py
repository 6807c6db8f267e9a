"""Training subsystem tests: schedule parity vs transformers, optimizer behavior,
train-step semantics (two-optimizer coupling), and loss descent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facialmmt_tpu.config import FacialMMTConfig, OptimConfig
from facialmmt_tpu.models.pipeline import FacialMMTPipeline
from facialmmt_tpu.models.unimodal import MeldUttTransformer
from facialmmt_tpu.train.optim import (MultiTaskState, SingleTaskState,
                                       make_optimizer, make_schedule)
from facialmmt_tpu.train.steps import (make_aux_train_step,
                                       make_multimodal_train_step,
                                       make_unimodal_eval_step,
                                       make_unimodal_train_step)

CFG = FacialMMTConfig.tiny()


def test_linear_warmup_schedule_matches_transformers():
    """vs transformers.get_linear_schedule_with_warmup stepped on a dummy optim."""
    import torch
    import transformers

    total, warm = 100, 0.1
    sched = make_schedule(1.0, total, warm)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    tsched = transformers.get_linear_schedule_with_warmup(
        opt, num_warmup_steps=int(total * warm), num_training_steps=total)
    for step in range(total):
        want = tsched.get_last_lr()[0]
        got = float(sched(step))
        np.testing.assert_allclose(got, want, atol=1e-7, err_msg=f"step {step}")
        opt.step()
        tsched.step()


def test_adamw_matches_transformers_adamw(rng):
    """One AdamW step on identical grads: optax chain vs the reference optimizer.

    The reference uses transformers 4.24's AdamW (reference train.py:307) with
    correct_bias=True, eps=1e-6 — mathematically identical to torch.optim.AdamW
    with the same hyperparameters (the class was removed in transformers 4.57,
    so torch's is the oracle here)."""
    import torch

    w0 = rng.normal(size=(6, 4)).astype(np.float32)
    g = rng.normal(size=(6, 4)).astype(np.float32)
    lr, wd = 1e-3, 0.01

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.AdamW([tp], lr=lr, weight_decay=wd, eps=1e-6)
    tp.grad = torch.from_numpy(g.copy())
    topt.step()
    want = tp.detach().numpy()

    import optax
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-6, weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
    got = np.asarray(optax.apply_updates(params, updates)["w"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def make_unimodal_data(rng, cfg, n=32):
    d = cfg.data
    feats = rng.normal(size=(n, d.vision_utt_max_len, d.vision_feat_dim)
                       ).astype(np.float32)
    mask = np.ones((n, d.vision_utt_max_len), np.int32)
    labels = rng.integers(0, 7, size=n)
    # make labels learnable from the mean feature
    for i in range(n):
        feats[i, :, labels[i]] += 2.0
    return jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(labels)


def test_unimodal_training_descends(rng):
    cfg = CFG
    feats, mask, labels = make_unimodal_data(rng, cfg)
    model = MeldUttTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), feats[:2], mask[:2])["params"]
    tx = make_optimizer(cfg.optim, 1e-3, 100, cfg.optim.weight_decay)
    state = SingleTaskState.create(params, tx)
    step = jax.jit(make_unimodal_train_step(model, tx))
    losses = []
    for i in range(30):
        state, loss = step(state, feats, mask, labels,
                           jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
    eval_step = jax.jit(make_unimodal_eval_step(model))
    logits, _ = eval_step(state.params, feats, mask, labels)
    acc = (np.asarray(logits).argmax(-1) == np.asarray(labels)).mean()
    assert acc > 0.5


def test_multimodal_training_descends(rng):
    """End-to-end learning through the FULL pipeline: repeated target steps on
    one learnable batch drive the CE loss down and fit the batch.  Per-step
    semantics (who updates, accumulation exactness) are pinned by the tests
    below; this pins that the COMPOSITION learns — gradients reach the
    classifier through span extraction, the frame filter, the A/V towers and
    both crossmodal stacks.  The reference has no equivalent check (SURVEY.md
    §4: no tests at all)."""
    from tests.test_models import make_multimodal_batch

    cfg = CFG
    b = 4
    batch = make_multimodal_batch(rng, cfg, b=b)
    # plant the label in the audio features so the task is learnable
    labels = np.asarray(batch["labels"])
    audio = np.asarray(batch["audio_inputs"]).copy()
    for i in range(b):
        audio[i, :, labels[i]] += 3.0
    batch = dict(batch, audio_inputs=jnp.asarray(audio))

    model = FacialMMTPipeline(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)
    opt_cfg = OptimConfig(warm_up=0.0)
    swin_tx = make_optimizer(opt_cfg, opt_cfg.aux_lr, 100)
    mm_tx = make_optimizer(opt_cfg, 1e-3, 100, opt_cfg.weight_decay)
    state = MultiTaskState.create(variables["params"],
                                  variables["batch_stats"], swin_tx, mm_tx)
    step = jax.jit(make_multimodal_train_step(model, swin_tx, mm_tx))
    losses = []
    for i in range(25):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0] * 0.5, losses


def test_multimodal_step_two_optimizer_coupling(rng):
    """Target-task step must update multimodal params, leave Swin params frozen,
    but still update Swin's BatchNorm running stats (reference semantics)."""
    from tests.test_models import make_multimodal_batch

    cfg = CFG
    batch = make_multimodal_batch(rng, cfg, b=2)
    # drop to 2 utterances' worth of faces
    model = FacialMMTPipeline(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)
    params, batch_stats = variables["params"], variables["batch_stats"]

    # warm_up=0: the warmup schedule yields lr=0 at step 0 (transformers parity),
    # which would make "params moved" assertions vacuous
    opt_cfg = OptimConfig(warm_up=0.0)
    swin_tx = make_optimizer(opt_cfg, opt_cfg.aux_lr, 100)
    mm_tx = make_optimizer(opt_cfg, opt_cfg.trg_lr, 100, opt_cfg.weight_decay)
    state = MultiTaskState.create(params, batch_stats, swin_tx, mm_tx)
    step = jax.jit(make_multimodal_train_step(model, swin_tx, mm_tx))
    new_state, loss = step(state, batch, jax.random.PRNGKey(2))

    assert np.isfinite(float(loss))
    # swin params untouched
    sw0 = jax.tree.leaves(state.params["swin_model"])
    sw1 = jax.tree.leaves(new_state.params["swin_model"])
    assert all(np.allclose(a, b) for a, b in zip(sw0, sw1))
    # multimodal params moved
    mm0 = jax.tree.leaves(state.params["multimodal"])
    mm1 = jax.tree.leaves(new_state.params["multimodal"])
    assert any(not np.allclose(a, b) for a, b in zip(mm0, mm1))
    # BN running stats moved (swin in train mode during target task)
    bs0 = jax.tree.leaves(state.batch_stats)
    bs1 = jax.tree.leaves(new_state.batch_stats)
    assert any(not np.allclose(a, b) for a, b in zip(bs0, bs1))
    assert int(new_state.mm_step) == 1 and int(new_state.swin_step) == 0


def test_aux_step_updates_swin(rng):
    from tests.test_models import make_multimodal_batch

    cfg = CFG
    batch = make_multimodal_batch(rng, cfg, b=2)
    model = FacialMMTPipeline(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)
    opt_cfg = OptimConfig(warm_up=0.0)
    swin_tx = make_optimizer(opt_cfg, opt_cfg.aux_lr, 100)
    mm_tx = make_optimizer(opt_cfg, opt_cfg.trg_lr, 100)
    state = MultiTaskState.create(variables["params"],
                                  variables["batch_stats"], swin_tx, mm_tx)
    step = jax.jit(make_aux_train_step(model, swin_tx))
    images = batch["faces"][:6]
    labels = jnp.asarray(rng.integers(0, 7, size=6))
    new_state, loss = step(state, images, labels, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    sw0 = jax.tree.leaves(state.params["swin_model"])
    sw1 = jax.tree.leaves(new_state.params["swin_model"])
    assert any(not np.allclose(a, b) for a, b in zip(sw0, sw1))
    mm0 = jax.tree.leaves(state.params["multimodal"])
    mm1 = jax.tree.leaves(new_state.params["multimodal"])
    assert all(np.allclose(a, b) for a, b in zip(mm0, mm1))


def test_multimodal_accum_step_matches_manual(rng):
    """The microbatch-scan step (make_multimodal_train_step_accum) must produce
    exactly the mean gradient / sequential batch_stats of an explicit Python
    loop over the microbatches with the same per-micro rngs."""
    import optax

    from facialmmt_tpu.train.steps import (cross_entropy,
                                           make_multimodal_train_step_accum)
    from tests.test_models import make_multimodal_batch

    cfg = CFG
    m = 2
    micros = [make_multimodal_batch(np.random.default_rng(7 + i), cfg, b=2)
              for i in range(m)]
    stacked = {k: jnp.stack([mi[k] for mi in micros]) for k in micros[0]}

    model = FacialMMTPipeline(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        micros[0])
    opt_cfg = OptimConfig(warm_up=0.0)
    swin_tx = make_optimizer(opt_cfg, opt_cfg.aux_lr, 100)
    mm_tx = make_optimizer(opt_cfg, opt_cfg.trg_lr, 100, opt_cfg.weight_decay)
    state = MultiTaskState.create(variables["params"],
                                  variables["batch_stats"], swin_tx, mm_tx)

    step_rng = jax.random.PRNGKey(5)
    step = jax.jit(make_multimodal_train_step_accum(
        model, swin_tx, mm_tx, swin_from_target=True))
    new_state, loss = step(state, stacked, step_rng)
    assert np.isfinite(float(loss))

    # manual re-derivation: per-micro grads with identical rngs, averaged
    def micro_loss(params, batch_stats, micro, r):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, micro,
            deterministic=False, stop_swin_gradient=False,
            rngs={"gumbel": r, "dropout": jax.random.fold_in(r, 1)},
            mutable=["batch_stats"])
        return cross_entropy(logits, micro["labels"]), mutated["batch_stats"]

    rngs = jax.random.split(step_rng, m)
    stats = state.batch_stats
    grads_sum, loss_sum = None, 0.0
    for i in range(m):
        (l, stats), g = jax.value_and_grad(micro_loss, has_aux=True)(
            state.params, stats, micros[i], rngs[i])
        loss_sum += float(l)
        grads_sum = g if grads_sum is None else jax.tree.map(
            jnp.add, grads_sum, g)
    grads = jax.tree.map(lambda x: x / m, grads_sum)
    np.testing.assert_allclose(float(loss), loss_sum / m, rtol=1e-5)

    mm_updates, _ = mm_tx.update(grads["multimodal"], state.mm_opt_state,
                                 state.params["multimodal"])
    want_mm = optax.apply_updates(state.params["multimodal"], mm_updates)
    sw_updates, _ = swin_tx.update(grads["swin_model"], state.swin_opt_state,
                                   state.params["swin_model"])
    want_sw = optax.apply_updates(state.params["swin_model"], sw_updates)

    for got, want in zip(jax.tree.leaves(new_state.params["multimodal"]),
                         jax.tree.leaves(want_mm)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-6)
    for got, want in zip(jax.tree.leaves(new_state.params["swin_model"]),
                         jax.tree.leaves(want_sw)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-6)
    for got, want in zip(jax.tree.leaves(new_state.batch_stats),
                         jax.tree.leaves(stats)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-6)
    # joint training: swin stepped
    assert int(new_state.swin_step) == 1 and int(new_state.mm_step) == 1


def test_multimodal_step_joint_updates_swin(rng):
    """swin_from_target=True on the fused step: target grads now DO update
    Swin (the explicit deviation knob, SURVEY.md §3.2)."""
    from tests.test_models import make_multimodal_batch

    cfg = CFG
    batch = make_multimodal_batch(rng, cfg, b=2)
    model = FacialMMTPipeline(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)
    opt_cfg = OptimConfig(warm_up=0.0)
    swin_tx = make_optimizer(opt_cfg, opt_cfg.aux_lr, 100)
    mm_tx = make_optimizer(opt_cfg, opt_cfg.trg_lr, 100)
    state = MultiTaskState.create(variables["params"],
                                  variables["batch_stats"], swin_tx, mm_tx)
    step = jax.jit(make_multimodal_train_step(model, swin_tx, mm_tx,
                                              swin_from_target=True))
    new_state, loss = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    sw0 = jax.tree.leaves(state.params["swin_model"])
    sw1 = jax.tree.leaves(new_state.params["swin_model"])
    assert any(not np.allclose(a, b) for a, b in zip(sw0, sw1))
    assert int(new_state.swin_step) == 1


def test_chunked_eval_step_matches_fused(rng):
    """face_chunk streaming (lax.map over face tiles) is bit-identical to the
    fused eval program under deterministic gumbel (VERDICT r2 weak #3: the
    chunked path is what lets eval batch >= 256 fit HBM)."""
    import dataclasses

    from facialmmt_tpu.train.steps import make_multimodal_eval_step
    from tests.test_models import make_multimodal_batch

    cfg = CFG.replace(runtime=dataclasses.replace(
        CFG.runtime, deterministic_gumbel=True))
    model = FacialMMTPipeline(cfg)
    batch = make_multimodal_batch(rng, cfg, b=3)  # 12 packed faces
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)

    fused = jax.jit(make_multimodal_eval_step(model, sample_gumbel=False))
    chunked = jax.jit(make_multimodal_eval_step(model, sample_gumbel=False,
                                                face_chunk=4))
    key = jax.random.PRNGKey(2)
    lf, _ = fused(variables["params"], variables["batch_stats"], batch, key)
    lc, _ = chunked(variables["params"], variables["batch_stats"], batch, key)
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lc))

    # a non-dividing chunk still CHUNKS (zero-padded final tile, pad probs
    # sliced off) — silently falling back to the fused program would
    # re-create the OOM the flag exists to avoid (r3 review)
    from facialmmt_tpu.train.steps import chunked_fer_probs
    probs_odd = chunked_fer_probs(model, variables, batch["faces"], key, 5)
    assert probs_odd is not None and probs_odd.shape[0] == \
        batch["faces"].shape[0]
    odd = jax.jit(make_multimodal_eval_step(model, sample_gumbel=False,
                                            face_chunk=5))
    lo, _ = odd(variables["params"], variables["batch_stats"], batch, key)
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lo))
