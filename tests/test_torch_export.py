"""Torch-format checkpoint export round-trips (VERDICT r2 missing #3 / next #8).

export (checkpoint/torch_export.py) is the exact inverse of the converter
(checkpoint/torch_convert.py): our params -> .pt -> load_torch_state_dict ->
convert back -> identical tree.  A strict load_state_dict into the reference's
own torch module classes additionally pins that every exported tensor name and
shape matches the reference layout (reference utils/util.py:121-159).
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.test_models import make_multimodal_batch

REFERENCE = "/root/reference"


def _assert_trees_equal(a, b):
    flat_a = jax.tree_util.tree_flatten_with_path(a)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(b)[0]
    assert [jax.tree_util.keystr(p) for p, _ in flat_a] == \
        [jax.tree_util.keystr(p) for p, _ in flat_b]
    for (p, va), (_, vb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(va, np.float32), np.asarray(vb, np.float32),
            err_msg=jax.tree_util.keystr(p))


def test_unimodal_export_roundtrip(tmp_path, rng):
    from facialmmt_tpu.checkpoint.torch_convert import (convert_unimodal,
                                                        load_torch_state_dict)
    from facialmmt_tpu.checkpoint.torch_export import (export_unimodal,
                                                       save_state_dict_pt)
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.unimodal import MeldUttTransformer

    cfg = FacialMMTConfig.tiny()
    model = MeldUttTransformer(cfg)
    x = jnp.asarray(rng.normal(size=(2, cfg.data.vision_utt_max_len,
                                     cfg.data.vision_feat_dim)), jnp.float32)
    m = jnp.ones((2, cfg.data.vision_utt_max_len), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, m)

    pt = str(tmp_path / "unimodal.pt")
    save_state_dict_pt(export_unimodal(variables), pt)
    back = convert_unimodal(load_torch_state_dict(pt), cfg)
    _assert_trees_equal(variables["params"], back["params"])


def test_multimodal_export_roundtrip(tmp_path, rng):
    from facialmmt_tpu.checkpoint.torch_convert import (convert_multimodal,
                                                        load_torch_state_dict)
    from facialmmt_tpu.checkpoint.torch_export import (export_multimodal,
                                                       save_state_dict_pt)
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.multimodal import \
        MultiModalTransformerForClassification

    cfg = FacialMMTConfig.tiny()
    model = MultiModalTransformerForClassification(cfg)
    b = make_multimodal_batch(rng, cfg, b=2)
    variables = model.init(
        jax.random.PRNGKey(0), b["dia_input_ids"], b["dia_input_mask"],
        b["dia_sep_mask"], audio_inputs=b["audio_inputs"],
        audio_mask=b["audio_mask"],
        vision_inputs=jnp.zeros(
            (2, cfg.data.vision_utt_max_len, cfg.vision_emb_dim)),
        vision_mask=jnp.ones((2, cfg.data.vision_utt_max_len), jnp.int32),
        utt_in_dia_idx=b["utt_in_dia_idx"], dia_idx=b["dia_idx"])

    pt = str(tmp_path / "multimodal.pt")
    save_state_dict_pt(export_multimodal(variables), pt)
    back = convert_multimodal(load_torch_state_dict(pt), cfg, cfg.text)
    _assert_trees_equal(variables["params"], back["params"])


def test_swin_fer_export_roundtrip(tmp_path, rng):
    from facialmmt_tpu.checkpoint.torch_convert import (convert_swin_fer,
                                                        load_torch_state_dict)
    from facialmmt_tpu.checkpoint.torch_export import (export_swin_fer,
                                                       save_state_dict_pt)
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.swin_fer import SwinForAffwildClassification

    cfg = FacialMMTConfig.tiny()
    model = SwinForAffwildClassification(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, cfg.data.swin_img_size,
                                        cfg.data.swin_img_size, 3)),
                       jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs)

    pt = str(tmp_path / "swin.pt")
    save_state_dict_pt(export_swin_fer(variables), pt)
    back = convert_swin_fer(load_torch_state_dict(pt), cfg)
    _assert_trees_equal(variables["params"], back["params"])
    _assert_trees_equal(variables["batch_stats"], back["batch_stats"])


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not available")
def test_export_loads_into_reference_module_strict(tmp_path, rng):
    """Exported tensors load into the reference's own meld_utt_transformer
    with strict=True — every name and shape matches the reference layout
    (reference src/models.py:192-223), so the reference's --doEval can
    consume models trained here."""
    from facialmmt_tpu.checkpoint.torch_convert import load_torch_state_dict
    from facialmmt_tpu.checkpoint.torch_export import (export_unimodal,
                                                       save_state_dict_pt)
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.unimodal import MeldUttTransformer

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    torch.Tensor.cuda = lambda self, *a, **k: self
    import src.models as ref_models

    cfg = FacialMMTConfig.tiny()
    model = MeldUttTransformer(cfg)
    x = jnp.asarray(rng.normal(size=(2, cfg.data.vision_utt_max_len,
                                     cfg.data.vision_feat_dim)), jnp.float32)
    m = jnp.ones((2, cfg.data.vision_utt_max_len), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, m)
    pt = str(tmp_path / "unimodal.pt")
    save_state_dict_pt(export_unimodal(variables), pt)

    args = types.SimpleNamespace(
        vision_featExtr_dim=cfg.data.vision_feat_dim,
        hidden_size=cfg.hidden_size,
        vision_utt_Transformernum=cfg.vision_utt_transformer_num,
        get_vision_utt_max_lens=cfg.data.vision_utt_max_len,
        num_labels=cfg.num_labels,
        num_attention_heads=cfg.encoder.num_attention_heads,
        intermediate_size=cfg.encoder.intermediate_size,
        attention_probs_dropout_prob=0.1, hidden_dropout_prob=0.1,
        layer_norm_eps=1e-12)
    torch.manual_seed(0)
    ref = ref_models.meld_utt_transformer(args).eval()
    ref.load_state_dict(
        {k: torch.as_tensor(v) for k, v in
         load_torch_state_dict(pt).items()}, strict=True)

    # and the loaded reference module agrees with our forward
    feats = rng.normal(size=(2, cfg.data.vision_utt_max_len,
                             cfg.data.vision_feat_dim)).astype(np.float32)
    mask = np.ones((2, cfg.data.vision_utt_max_len), np.int64)
    mask[1, 3:] = 0
    with torch.no_grad():
        want = ref(torch.from_numpy(feats),
                   torch.from_numpy(mask)).numpy()
    got = np.asarray(model.apply({"params": variables["params"]},
                                 jnp.asarray(feats), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cli_export_pipeline_checkpoint(tmp_path, rng):
    """tools.py export-checkpoint --kind pipeline: orbax best checkpoint ->
    <out>_multimodal.pt + <out>_swin.pt, both converting back to the exact
    source subtrees."""
    from facialmmt_tpu import tools
    from facialmmt_tpu.checkpoint.orbax_io import CheckpointManager
    from facialmmt_tpu.checkpoint.torch_convert import (convert_multimodal,
                                                        convert_swin_fer,
                                                        load_torch_state_dict)
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline

    cfg = FacialMMTConfig.tiny()
    model = FacialMMTPipeline(cfg)
    batch = make_multimodal_batch(rng, cfg, b=2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)
    mgr = CheckpointManager(str(tmp_path / "saved"), keep_best_only=False)
    mgr.save("best_1", {"params": variables["params"],
                        "batch_stats": variables["batch_stats"]})

    base = str(tmp_path / "export")
    tools.main(["export-checkpoint", "--kind", "pipeline",
                "--input", str(tmp_path / "saved" / "best_1"),
                "--output", base + ".pt"])
    tree = mgr.restore("best_1")

    mm_back = convert_multimodal(
        load_torch_state_dict(base + "_multimodal.pt"), cfg, cfg.text)
    _assert_trees_equal(tree["params"]["multimodal"], mm_back["params"])
    sw_back = convert_swin_fer(load_torch_state_dict(base + "_swin.pt"), cfg)
    _assert_trees_equal(tree["params"]["swin_model"], sw_back["params"])
    _assert_trees_equal(tree["batch_stats"]["swin_model"],
                        sw_back["batch_stats"])


def _reference_modules():
    """Import reference modules with timm stubbed and .cuda() no-op'd."""
    import facialmmt_tpu.checkpoint.torch_convert as tc
    try:
        tc.load_torch_state_dict("/nonexistent")  # installs the timm stub
    except Exception:
        pass
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    torch.Tensor.cuda = lambda self, *a, **k: self
    import modules.CrossmodalTransformer as ref_crossmodal
    import modules.SwinTransformer.Swin_Transformer as ref_swin
    return ref_swin, ref_crossmodal


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not available")
def test_swin_export_loads_into_reference_backbone_strict(rng):
    """Full-size round trip: reference Swin state_dict -> convert_swin_fer ->
    export_swin_fer -> strict load_state_dict back into the reference's own
    SwinTransformer, byte-equal on every tensor INCLUDING the persistent
    relative_position_index / attn_mask buffers (reference
    Swin_Transformer.py:103,231) the export must synthesize (r3 review: a
    strict load previously failed with missing buffer keys)."""
    from facialmmt_tpu.checkpoint.torch_convert import convert_swin_fer
    from facialmmt_tpu.checkpoint.torch_export import export_swin_fer
    from facialmmt_tpu.config import FacialMMTConfig

    ref_swin, _ = _reference_modules()
    torch.manual_seed(0)
    backbone = ref_swin.SwinTransformer(
        img_size=224, patch_size=4, in_chans=3, embed_dim=96,
        depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24], window_size=7,
        drop_path_rate=0.0, ape=False, patch_norm=True).eval()
    head_linear = torch.nn.Linear(512, 64)
    head_cls = torch.nn.Linear(64, 7)
    sd = {f"swin.{k}": v.detach().numpy()
          for k, v in backbone.state_dict().items()}
    sd.update({f"linear.{k}": v.detach().numpy()
               for k, v in head_linear.state_dict().items()})
    sd.update({f"classifier.{k}": v.detach().numpy()
               for k, v in head_cls.state_dict().items()})

    variables = convert_swin_fer(sd, FacialMMTConfig())
    out = export_swin_fer(variables)

    back = {k[len("swin."):]: torch.as_tensor(v) for k, v in out.items()
            if k.startswith("swin.")}
    backbone.load_state_dict(back, strict=True)
    for k, v in backbone.state_dict().items():
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      sd[f"swin.{k}"], err_msg=k)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not available")
def test_crossmodal_export_loads_into_reference_encoder_strict(rng):
    """export_crossmodal emits the reference encoder's full key set including
    its persistent buffers ('version', 'embed_positions._float_tensor' —
    reference CrossmodalTransformer.py:44, position_embedding.py:42), so the
    strict load passes."""
    from facialmmt_tpu.checkpoint.torch_convert import convert_crossmodal
    from facialmmt_tpu.checkpoint.torch_export import export_crossmodal

    _, ref_cm = _reference_modules()
    torch.manual_seed(0)
    enc = ref_cm.CrossModalTransformerEncoder(32, 4, 2).eval()
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    tree = convert_crossmodal(sd, "", 2)
    out = {}
    export_crossmodal(tree, out, "")
    enc.load_state_dict({k: torch.as_tensor(v) for k, v in out.items()},
                        strict=True)
    for k in sd:
        if k in ("version", "embed_positions._float_tensor"):
            continue  # dtype/device sentinels, values unused
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)
