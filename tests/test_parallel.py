"""Mesh/sharding tests on the 8-virtual-device CPU backend (SURVEY.md §4d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facialmmt_tpu.config import FacialMMTConfig
from facialmmt_tpu.parallel.mesh import (batch_sharding, build_mesh,
                                         param_shardings, shard_batch)

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def test_build_mesh_shapes():
    plan = build_mesh(dp=-1, tp=1)
    assert plan.mesh.shape == {"data": 8, "model": 1}
    plan = build_mesh(dp=4, tp=2)
    assert plan.mesh.shape == {"data": 4, "model": 2}


def test_shard_batch_places_leading_axis():
    plan = build_mesh(dp=8, tp=1)
    batch = {"x": jnp.zeros((16, 5)), "y": jnp.zeros((16,), jnp.int32)}
    sharded = shard_batch(plan, batch)
    assert sharded["x"].sharding.spec == batch_sharding(plan).spec
    # each device holds 2 rows
    shards = sharded["x"].addressable_shards
    assert len(shards) == 8 and shards[0].data.shape == (2, 5)


def test_dp_training_step_on_mesh(rng):
    """Full unimodal train step pjit-ed over an 8-way data mesh: the same jitted
    step, params replicated, batch sharded — XLA inserts the gradient psums."""
    from facialmmt_tpu.models.unimodal import MeldUttTransformer
    from facialmmt_tpu.train.optim import SingleTaskState, make_optimizer
    from facialmmt_tpu.train.steps import make_unimodal_train_step

    cfg = FacialMMTConfig.tiny()
    plan = build_mesh(dp=8, tp=1)
    d = cfg.data
    feats = jnp.asarray(rng.normal(size=(16, d.vision_utt_max_len,
                                         d.vision_feat_dim)), jnp.float32)
    mask = jnp.ones((16, d.vision_utt_max_len), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 7, size=16), jnp.int32)

    model = MeldUttTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), feats[:2], mask[:2])["params"]
    tx = make_optimizer(cfg.optim, 1e-3, 10)
    state = SingleTaskState.create(params, tx)

    # replicate state, shard batch
    rep = jax.device_put(state, jax.tree.map(
        lambda _: jax.sharding.NamedSharding(plan.mesh,
                                             jax.sharding.PartitionSpec()),
        state))
    batch = shard_batch(plan, {"f": feats, "m": mask, "l": labels})
    step = jax.jit(make_unimodal_train_step(model, tx))
    new_state, loss = step(rep, batch["f"], batch["m"], batch["l"],
                           jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # parity vs single-device execution
    single_state, single_loss = jax.jit(
        make_unimodal_train_step(model, tx))(state, feats, mask, labels,
                                             jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss), float(single_loss), rtol=1e-5)


def test_tp_param_shardings_rules():
    """Text-tower kernels get model-axis specs; everything else replicates."""
    from facialmmt_tpu.models.text_encoder import TextEncoder
    from facialmmt_tpu.config import TextEncoderConfig

    plan = build_mesh(dp=4, tp=2)
    cfg = TextEncoderConfig.tiny()
    enc = TextEncoder(cfg)
    ids = jnp.ones((2, 16), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))["params"]
    tree = param_shardings(plan, {"text_encoder": params})
    q = tree["text_encoder"]["layer_0"]["query"]["kernel"]
    assert q.spec == jax.sharding.PartitionSpec(None, "model")
    out = tree["text_encoder"]["layer_0"]["attn_out"]["kernel"]
    assert out.spec == jax.sharding.PartitionSpec("model", None)
    norm = tree["text_encoder"]["embeddings_norm"]["weight"]
    assert norm.spec == jax.sharding.PartitionSpec()


def test_tp_text_encoder_runs_sharded(rng):
    """Text encoder executes with tensor-parallel params over tp=2 and matches
    the replicated result."""
    from facialmmt_tpu.models.text_encoder import TextEncoder
    from facialmmt_tpu.config import TextEncoderConfig

    plan = build_mesh(dp=4, tp=2)
    cfg = TextEncoderConfig.tiny()
    enc = TextEncoder(cfg)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(8, 16)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]

    want = np.asarray(enc.apply({"params": params}, ids, mask))

    shardings = param_shardings(plan, params)
    sharded_params = jax.device_put(params, shardings)
    data_sh = jax.sharding.NamedSharding(plan.mesh,
                                         jax.sharding.PartitionSpec("data"))
    ids_s = jax.device_put(ids, data_sh)
    mask_s = jax.device_put(mask, data_sh)
    got = np.asarray(jax.jit(
        lambda p, i, m: enc.apply({"params": p}, i, m))(
            sharded_params, ids_s, mask_s))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_trainer_unimodal_on_dp_mesh(tmp_path, rng):
    """Full unimodal training run with the Trainer's mesh integration
    (--dp path): dp=8 over the virtual CPU mesh."""
    import dataclasses

    from facialmmt_tpu.config import OptimConfig, ParallelConfig, RuntimeConfig
    from facialmmt_tpu.data.meld import MeldVisionDataset
    from facialmmt_tpu.train.trainer import Trainer
    from facialmmt_tpu.utils.observability import MetricWriter
    from tests.fixtures import write_meld_fixture

    for split in ("train", "val", "test"):
        write_meld_fixture(str(tmp_path), split=split, num_dia=4,
                           utts_per_dia=4, seed=hash(split) % 50)
    train_ds = MeldVisionDataset(str(tmp_path), "train")
    cfg = FacialMMTConfig.tiny().replace(
        parallel=ParallelConfig(dp=8, tp=1),
        optim=OptimConfig(num_epochs=1, trg_batch_size=8,
                          trg_accumulation_steps=1, trg_lr=1e-3, warm_up=0.0),
        runtime=RuntimeConfig(save_model_path=str(tmp_path / "saved"),
                              compute_dtype="float32", metrics_path="",
                              trg_log_interval=1000))
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, vision_utt_max_len=train_ds.max_utt_len,
        vision_feat_dim=train_ds.feat_dim))
    trainer = Trainer(cfg, MetricWriter("", also_print=False))
    assert trainer.plan is not None
    assert trainer.plan.mesh.shape == {"data": 8, "model": 1}
    wf1 = trainer.run_unimodal(train_ds,
                               MeldVisionDataset(str(tmp_path), "val"),
                               MeldVisionDataset(str(tmp_path), "test"))
    assert 0.0 <= wf1 <= 1.0


def test_trainer_dialogue_on_dp_mesh(tmp_path):
    """Dia-level training over a dp mesh: DialogueTrainer places state and
    batches via the same mesh plan as the utterance-level trainer."""
    import dataclasses
    import os

    from facialmmt_tpu.config import OptimConfig, ParallelConfig, RuntimeConfig
    from facialmmt_tpu.data.meld import (MeldDialogueDataset,
                                         MeldMultimodalDataset, MeldTextArrays)
    from facialmmt_tpu.data.text_prep import MeldTextPreprocessor
    from facialmmt_tpu.train.trainer import DialogueTrainer
    from facialmmt_tpu.utils.observability import MetricWriter
    from tests.fixtures import WhitespaceTokenizer, write_meld_fixture

    tok = WhitespaceTokenizer()
    prep = MeldTextPreprocessor(tok, is_roberta=True, max_seq_length=64)

    def build(split):
        write_meld_fixture(str(tmp_path), split=split, num_dia=4,
                           utts_per_dia=3, seed=hash(split) % 50)
        feats = prep.preprocess_split(
            os.path.join(tmp_path, f"{split}_sent_emo.csv"),
            os.path.join(tmp_path, f"{split}_text.json"))
        ids, mask, sep = MeldTextPreprocessor.to_arrays(feats)
        base = MeldMultimodalDataset(str(tmp_path), split,
                                     MeldTextArrays(ids, mask, sep))
        return MeldDialogueDataset(base)

    cfg = FacialMMTConfig.tiny()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, max_seq_length=64),
        parallel=ParallelConfig(dp=4, tp=1),
        optim=OptimConfig(num_epochs=1, trg_batch_size=4, trg_lr=1e-3,
                          warm_up=0.0),
        runtime=RuntimeConfig(save_model_path=str(tmp_path / "saved"),
                              compute_dtype="float32", metrics_path="",
                              trg_log_interval=1000))
    trainer = DialogueTrainer(cfg, MetricWriter("", also_print=False))
    assert trainer.plan is not None
    assert trainer.plan.mesh.shape == {"data": 4, "model": 1}
    f1 = trainer.run_dialogue(build("train"), build("val"), build("test"))
    assert 0.0 <= f1 <= 1.0


def test_tp_fusion_towers_run_sharded(rng):
    """The fusion model's audio/vision encoder towers shard over 'model'
    (Megatron column/row rules in parallel/mesh.py) and match the replicated
    result end-to-end through the full multimodal forward."""
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.multimodal import (
        MultiModalTransformerForClassification)

    plan = build_mesh(dp=4, tp=2)
    cfg = FacialMMTConfig.tiny()
    m = MultiModalTransformerForClassification(cfg, dtype=jnp.float32)
    b, L = 8, cfg.data.max_seq_length
    d = cfg.data
    kw = dict(
        audio_inputs=jnp.asarray(
            rng.normal(size=(b, d.audio_utt_max_len, d.audio_feat_dim)),
            jnp.float32),
        audio_mask=jnp.ones((b, d.audio_utt_max_len), jnp.int32),
        vision_inputs=jnp.asarray(
            rng.normal(size=(b, d.vision_utt_max_len, 519)), jnp.float32),
        vision_mask=jnp.ones((b, d.vision_utt_max_len), jnp.int32),
        utt_in_dia_idx=jnp.zeros((b,), jnp.int32))
    ids = jnp.asarray(rng.integers(2, cfg.text.vocab_size, size=(b, L)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    sep = jnp.zeros_like(ids).at[:, [5, 11]].set(1)
    params = m.init(jax.random.PRNGKey(0), ids, mask, sep, **kw)["params"]

    # at least one tower leaf must actually shard over 'model'
    sh = param_shardings(plan, params)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    tower_sharded = [
        "/".join(str(getattr(k, "key", k)) for k in kp) for kp, s in flat
        if "utt_transformer" in str(kp) and s.spec != jax.sharding.PartitionSpec()]
    assert tower_sharded, "no fusion-tower leaf got a TP spec"
    cm_sharded = [
        "/".join(str(getattr(k, "key", k)) for k in kp) for kp, s in flat
        if "CrossModalTrans" in str(kp) and s.spec != jax.sharding.PartitionSpec()]
    assert cm_sharded, "no crossmodal leaf got a TP spec"

    want = np.asarray(m.apply({"params": params}, ids, mask, sep, **kw))
    sharded_params = jax.device_put(params, sh)
    data_sh = jax.sharding.NamedSharding(plan.mesh,
                                         jax.sharding.PartitionSpec("data"))
    args_s = jax.device_put((ids, mask, sep), data_sh)
    kw_s = {k: (jax.device_put(v, data_sh) if hasattr(v, "shape") and
                v.ndim and v.shape[0] == b else v) for k, v in kw.items()}
    got = np.asarray(jax.jit(
        lambda p, a, kw: m.apply({"params": p}, *a, **kw))(
            sharded_params, args_s, kw_s))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_zero1_opt_state_shardings_and_step_exactness(rng):
    """ZeRO-1 moment sharding (parallel/mesh.py::opt_state_shardings): large
    AdamW moment leaves shard over 'data', small ones replicate, and a train
    step with sharded moments produces EXACTLY the same params/moments as the
    replicated run (the optimizer math is elementwise)."""
    from facialmmt_tpu.models.unimodal import MeldUttTransformer
    from facialmmt_tpu.parallel.mesh import opt_state_shardings
    from facialmmt_tpu.train.optim import SingleTaskState, make_optimizer
    from facialmmt_tpu.train.steps import make_unimodal_train_step

    cfg = FacialMMTConfig.tiny()
    plan = build_mesh(dp=8, tp=1)
    d = cfg.data
    feats = jnp.asarray(rng.normal(size=(16, d.vision_utt_max_len,
                                         d.vision_feat_dim)), jnp.float32)
    mask = jnp.ones((16, d.vision_utt_max_len), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 7, size=16), jnp.int32)

    model = MeldUttTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), feats[:2], mask[:2])["params"]
    tx = make_optimizer(cfg.optim, 1e-3, 10)
    state = SingleTaskState.create(params, tx)

    # low threshold so the tiny model's moment leaves actually shard
    opt_sh = opt_state_shardings(plan, state.opt_state, min_size=64)
    sharded_specs = [s.spec for s in jax.tree.leaves(opt_sh)
                     if s.spec != jax.sharding.PartitionSpec()]
    assert sharded_specs, "no moment leaf sharded — threshold/divisibility bug"
    for spec in sharded_specs:
        assert "data" in [ax for ax in spec if ax is not None]

    rep = jax.sharding.NamedSharding(plan.mesh, jax.sharding.PartitionSpec())
    z_state = SingleTaskState(
        params=jax.device_put(params, jax.tree.map(lambda _: rep, params)),
        opt_state=jax.device_put(state.opt_state, opt_sh),
        step=jax.device_put(state.step, rep))
    batch = shard_batch(plan, {"f": feats, "m": mask, "l": labels})
    step = jax.jit(make_unimodal_train_step(model, tx))
    z_new, z_loss = step(z_state, batch["f"], batch["m"], batch["l"],
                         jax.random.PRNGKey(1))

    ref_new, ref_loss = jax.jit(make_unimodal_train_step(model, tx))(
        state, feats, mask, labels, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(z_loss), float(ref_loss), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        ref_new.params, jax.device_get(z_new.params))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        ref_new.opt_state, jax.device_get(z_new.opt_state))
    # output moments keep their ZeRO-1 sharding (no silent re-replication)
    out_specs = [x.sharding.spec for x in jax.tree.leaves(z_new.opt_state)
                 if hasattr(x, "sharding")
                 and x.sharding.spec != jax.sharding.PartitionSpec()]
    assert out_specs, "step re-replicated the moments"


def test_trainer_places_zero1_moments(tmp_path, rng):
    """Trainer._place_state shards opt-state moments over 'data' when
    parallel.zero1 is on (default) and replicates them when off."""
    from facialmmt_tpu.config import OptimConfig, ParallelConfig, RuntimeConfig
    from facialmmt_tpu.models.unimodal import MeldUttTransformer
    from facialmmt_tpu.train.optim import SingleTaskState, make_optimizer
    from facialmmt_tpu.train.trainer import Trainer
    from facialmmt_tpu.utils.observability import MetricWriter

    import dataclasses

    base = FacialMMTConfig.tiny().replace(
        optim=OptimConfig(num_epochs=1, trg_batch_size=8,
                          trg_accumulation_steps=1),
        runtime=RuntimeConfig(save_model_path=str(tmp_path), metrics_path="",
                              compute_dtype="float32"))

    def place(zero1):
        cfg = base.replace(parallel=ParallelConfig(dp=8, tp=1, zero1=zero1))
        t = Trainer(cfg, MetricWriter("", also_print=False))
        assert t.plan is not None
        model = MeldUttTransformer(cfg)
        d = cfg.data
        feats = jnp.asarray(rng.normal(size=(2, d.vision_utt_max_len,
                                             d.vision_feat_dim)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), feats,
                            jnp.ones((2, d.vision_utt_max_len)))["params"]
        tx = make_optimizer(cfg.optim, 1e-3, 10)
        state = t._place_state(SingleTaskState.create(params, tx))
        return [x.sharding.spec for x in jax.tree.leaves(state.opt_state)
                if hasattr(x, "sharding")]

    specs_off = place(zero1=False)
    assert all(s == jax.sharding.PartitionSpec() for s in specs_off)
    # tiny model: leaves are below the 65536 default threshold except none —
    # so just assert the call path works and yields only valid specs
    specs_on = place(zero1=True)
    for s in specs_on:
        for ax in s:
            assert ax in (None, "data")
