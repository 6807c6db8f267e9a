"""Appendix capability tests: dialogue-level model, submission writer,
pred/true dump, early stopping, serving path."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from facialmmt_tpu.config import FacialMMTConfig

CFG = FacialMMTConfig.tiny()


def test_scatter_sep_features(rng):
    from facialmmt_tpu.models.dialogue import scatter_sep_features

    feats = rng.normal(size=(2, 10, 4)).astype(np.float32)
    sep = np.zeros((2, 10), np.int64)
    sep[0, 3] = sep[0, 7] = 1
    sep[1, 5] = 1
    out = np.asarray(scatter_sep_features(jnp.asarray(feats),
                                          jnp.asarray(sep), 3))
    np.testing.assert_allclose(out[0, 0], feats[0, 3])
    np.testing.assert_allclose(out[0, 1], feats[0, 7])
    np.testing.assert_allclose(out[0, 2], 0)
    np.testing.assert_allclose(out[1, 0], feats[1, 5])


def test_dialogue_model_forward(rng):
    from facialmmt_tpu.models.dialogue import DialogueMultiModalTransformer

    cfg = CFG
    d = cfg.data
    b, dmax = 2, 4
    ids = jnp.asarray(rng.integers(2, cfg.text.vocab_size,
                                   size=(b, d.max_seq_length)), jnp.int32)
    mask = jnp.ones_like(ids)
    sep = np.zeros((b, d.max_seq_length), np.int32)
    sep[:, 5] = sep[:, 12] = sep[:, 20] = 1
    audio = jnp.asarray(rng.normal(
        size=(b, dmax, d.audio_utt_max_len, d.audio_feat_dim)), jnp.float32)
    amask = jnp.ones((b, dmax, d.audio_utt_max_len), jnp.int32)
    vision = jnp.asarray(rng.normal(
        size=(b, dmax, d.vision_utt_max_len, d.vision_feat_dim)), jnp.float32)
    vmask = jnp.ones((b, dmax, d.vision_utt_max_len), jnp.int32)
    dia_mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.int32)

    for fuse in ("crossmodal", "concat"):
        model = DialogueMultiModalTransformer(cfg.replace(modality_fuse=fuse))
        params = model.init(jax.random.PRNGKey(0), ids, mask,
                            jnp.asarray(sep), audio, amask, vision, vmask,
                            dia_mask)
        logits = model.apply(params, ids, mask, jnp.asarray(sep), audio,
                             amask, vision, vmask, dia_mask)
        assert logits.shape == (b, dmax, 7)
        assert np.isfinite(np.asarray(logits)).all()


def test_submission_writer(tmp_path, rng):
    from facialmmt_tpu.utils.submission import (M3ED_EMOTIONS,
                                                write_submission_csv)

    template = tmp_path / "empty.csv"
    with open(template, "w") as f:
        f.write("id,emotion\n")
        for i in range(5):
            f.write(f"utt{i},\n")
    logits = rng.normal(size=(5, 7))
    out = tmp_path / "sub.csv"
    write_submission_csv(logits, str(template), str(out))
    lines = open(out).read().splitlines()
    assert lines[0] == "id,emotion"
    for i, line in enumerate(lines[1:]):
        name = line.split(",")[1]
        assert name == M3ED_EMOTIONS[int(logits[i].argmax())]


def test_pred_true_dump(tmp_path):
    from facialmmt_tpu.utils.submission import write_pred_true_dump

    preds = np.array([1, 2, 3])
    truths = np.array([1, 0, 3])
    n = write_pred_true_dump(preds, truths, str(tmp_path / "d.txt"))
    assert n == 2
    assert open(tmp_path / "d.txt").read() == "1 1\n2 0\n3 3\n"


def test_early_stopping_config():
    from facialmmt_tpu.config import OptimConfig

    assert OptimConfig().patience == 0
    assert OptimConfig(patience=3).patience == 3


def test_serving_fixed_latency_path(rng):
    from facialmmt_tpu.serving import EmotionServer
    from tests.test_models import make_multimodal_batch

    cfg = CFG
    batch = make_multimodal_batch(rng, cfg, b=2)
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline

    model = FacialMMTPipeline(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)

    server = EmotionServer(cfg, variables, max_batch=2, face_capacity=8)
    d = cfg.data
    reqs = [{
        "audio": rng.normal(size=(5, d.audio_feat_dim)),
        "vision": rng.normal(size=(3, d.vision_feat_dim)),
        "faces": rng.integers(0, 255, (3, 160, 160, 3), dtype=np.uint8),
        "input_ids": rng.integers(2, cfg.text.vocab_size, size=(20,)),
        "sep_mask": np.eye(20)[7],
    }, {
        "audio": rng.normal(size=(4, d.audio_feat_dim)),
    }]
    out = server.predict(reqs)
    assert len(out) == 2
    for probs in out:
        assert probs.shape == (7,)
        np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-4)
