"""Model composition smoke + behavior tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facialmmt_tpu.config import FacialMMTConfig
from facialmmt_tpu.models.multimodal import MultiModalTransformerForClassification
from facialmmt_tpu.models.pipeline import FacialMMTPipeline
from facialmmt_tpu.models.swin_fer import SwinForAffwildClassification
from facialmmt_tpu.models.text_encoder import TextEncoder, roberta_position_ids
from facialmmt_tpu.models.unimodal import MeldUttTransformer

CFG = FacialMMTConfig.tiny()


def make_multimodal_batch(rng, cfg, b=3, num_dia=None):
    L = cfg.data.max_seq_length
    num_dia = num_dia or b
    d = cfg.data
    ids = rng.integers(2, cfg.text.vocab_size, size=(num_dia, L))
    mask = np.ones((num_dia, L), np.int32)
    sep = np.zeros((num_dia, L), np.int32)
    sep[:, 8] = sep[:, 20] = sep[:, 30] = 1
    faces_n = 4 * b
    return {
        "dia_input_ids": jnp.asarray(ids, jnp.int32),
        "dia_input_mask": jnp.asarray(mask),
        "dia_sep_mask": jnp.asarray(sep),
        "utt_in_dia_idx": jnp.asarray(rng.integers(0, 3, size=(b,)), jnp.int32),
        "dia_idx": jnp.asarray(rng.integers(0, num_dia, size=(b,)), jnp.int32),
        "audio_inputs": jnp.asarray(
            rng.normal(size=(b, d.audio_utt_max_len, d.audio_feat_dim)),
            jnp.float32),
        "audio_mask": jnp.ones((b, d.audio_utt_max_len), jnp.int32),
        "vision_feats": jnp.asarray(
            rng.normal(size=(b, d.vision_utt_max_len, d.vision_feat_dim)),
            jnp.float32),
        "n_faces": jnp.full((b,), 4, jnp.int32),
        "faces": jnp.asarray(
            rng.normal(size=(faces_n, d.swin_img_size, d.swin_img_size, 3)),
            jnp.float32),
        "face_utt_id": jnp.asarray(np.repeat(np.arange(b), 4), jnp.int32),
        "face_pos": jnp.asarray(np.tile(np.arange(4), b), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 7, size=(b,)), jnp.int32),
    }


def test_unimodal_shapes(rng):
    cfg = CFG
    x = jnp.asarray(rng.normal(size=(4, cfg.data.vision_utt_max_len,
                                     cfg.data.vision_feat_dim)), jnp.float32)
    m = jnp.ones((4, cfg.data.vision_utt_max_len), jnp.int32)
    model = MeldUttTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), x, m)
    out = model.apply(params, x, m)
    assert out.shape == (4, 7)
    assert np.all(np.isfinite(np.asarray(out)))


def test_swin_fer_shapes_and_gumbel(rng):
    cfg = CFG
    imgs = jnp.asarray(rng.normal(size=(5, 32, 32, 3)), jnp.float32)
    model = SwinForAffwildClassification(cfg)
    params = model.init(jax.random.PRNGKey(0), imgs)
    logits = model.apply(params, imgs)
    assert logits.shape == (5, 7)
    dist = model.apply(params, imgs, is_trg_task=True,
                       rngs={"gumbel": jax.random.PRNGKey(1)})
    s = np.asarray(dist).sum(-1)
    np.testing.assert_allclose(s, 1.0, rtol=1e-5)


def test_text_encoder_roberta_position_ids():
    ids = jnp.asarray([[5, 7, 9, 1, 1], [5, 1, 9, 9, 1]], jnp.int32)  # pad=1
    pos = np.asarray(roberta_position_ids(ids, 1))
    np.testing.assert_array_equal(pos[0], [2, 3, 4, 1, 1])
    np.testing.assert_array_equal(pos[1], [2, 1, 3, 4, 1])


def test_multimodal_forward_tav(rng):
    cfg = CFG
    batch = make_multimodal_batch(rng, cfg)
    model = MultiModalTransformerForClassification(cfg)
    params = model.init(
        jax.random.PRNGKey(0), batch["dia_input_ids"], batch["dia_input_mask"],
        batch["dia_sep_mask"], batch["audio_inputs"], batch["audio_mask"],
        jnp.zeros((3, cfg.data.vision_utt_max_len, cfg.vision_emb_dim)),
        jnp.ones((3, cfg.data.vision_utt_max_len), jnp.int32),
        batch["utt_in_dia_idx"], batch["dia_idx"])
    out = model.apply(
        params, batch["dia_input_ids"], batch["dia_input_mask"],
        batch["dia_sep_mask"], batch["audio_inputs"], batch["audio_mask"],
        jnp.zeros((3, cfg.data.vision_utt_max_len, cfg.vision_emb_dim)),
        jnp.ones((3, cfg.data.vision_utt_max_len), jnp.int32),
        batch["utt_in_dia_idx"], batch["dia_idx"])
    assert out.shape == (3, 7)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("modality,fuse", [
    ("T+A", "crossmodal"), ("T+V", "crossmodal"),
    ("T+A+V", "concat"), ("T+A", "concat")])
def test_multimodal_appendix_variants(rng, modality, fuse):
    cfg = CFG.replace(choice_modality=modality, modality_fuse=fuse)
    b = 2
    batch = make_multimodal_batch(rng, cfg, b=b)
    model = MultiModalTransformerForClassification(cfg)
    kw = dict(
        audio_inputs=batch["audio_inputs"][:b] if "A" in modality else None,
        audio_mask=batch["audio_mask"][:b] if "A" in modality else None,
        vision_inputs=(jnp.zeros((b, cfg.data.vision_utt_max_len,
                                  cfg.vision_emb_dim))
                       if "V" in modality else None),
        vision_mask=(jnp.ones((b, cfg.data.vision_utt_max_len), jnp.int32)
                     if "V" in modality else None),
        utt_in_dia_idx=batch["utt_in_dia_idx"][:b],
        dia_idx=batch["dia_idx"][:b])
    params = model.init(jax.random.PRNGKey(0), batch["dia_input_ids"],
                        batch["dia_input_mask"], batch["dia_sep_mask"], **kw)
    out = model.apply(params, batch["dia_input_ids"], batch["dia_input_mask"],
                      batch["dia_sep_mask"], **kw)
    assert out.shape == (b, 7)


def test_fused_pipeline_end_to_end(rng):
    cfg = CFG
    batch = make_multimodal_batch(rng, cfg)
    model = FacialMMTPipeline(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)
    assert set(params["params"].keys()) == {"swin_model", "multimodal"}
    out = model.apply(params, batch, rngs={"gumbel": jax.random.PRNGKey(2)})
    assert out.shape == (3, 7)
    # aux head on the same shared swin params
    aux = model.apply(params, batch["faces"], method=FacialMMTPipeline.aux_logits)
    assert aux.shape == (12, 7)
