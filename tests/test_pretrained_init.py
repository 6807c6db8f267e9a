"""Pretrained-PLM initialization for from-scratch training (VERDICT r2 #1).

The reference always builds its text tower from pretrained weights
(`RobertaModel.from_pretrained` — reference src/models.py:72-77, resolved from
<project>/pretrained_model/<plm_name> at reference main.py:118; chinese-roberta
at (Appendix)CCAC2023/src/models.py:51,262).  These tests pin the TPU rebuild's
equivalent: a local HF dir converted by
checkpoint/torch_convert.py::load_pretrained_hf_text_tower and grafted into the
init params of every training path (train/trainer.py).
"""

import dataclasses
import os

import numpy as np
import pytest
import torch

from tests.fixtures import WhitespaceTokenizer, write_meld_fixture


def _save_tiny_hf_roberta(path, tcfg, seed=0):
    from transformers import RobertaConfig, RobertaModel

    torch.manual_seed(seed)
    hf = RobertaModel(RobertaConfig(
        vocab_size=tcfg.vocab_size, hidden_size=tcfg.hidden_size,
        num_hidden_layers=tcfg.num_layers, num_attention_heads=tcfg.num_heads,
        intermediate_size=tcfg.intermediate_size,
        max_position_embeddings=tcfg.max_position_embeddings,
        type_vocab_size=tcfg.type_vocab_size, pad_token_id=tcfg.pad_token_id,
        layer_norm_eps=tcfg.layer_norm_eps), add_pooling_layer=False).eval()
    hf.save_pretrained(path)
    return hf


def test_load_pretrained_hf_text_tower_forward_parity(tmp_path, rng):
    """The converted tree reproduces the HF model's forward through OUR
    encoder (VERDICT r2 #1 'done' condition; oracle pattern of
    test_torch_parity.py::test_text_encoder_parity_vs_hf)."""
    import jax.numpy as jnp

    from facialmmt_tpu.checkpoint.torch_convert import (
        load_pretrained_hf_text_tower)
    from facialmmt_tpu.config import TextEncoderConfig
    from facialmmt_tpu.models.text_encoder import TextEncoder

    tcfg = TextEncoderConfig.tiny("roberta")
    hf = _save_tiny_hf_roberta(tmp_path / "plm", tcfg)

    params = load_pretrained_hf_text_tower(str(tmp_path / "plm"), tcfg)

    ids = rng.integers(2, tcfg.vocab_size, size=(2, 19))
    mask = np.ones((2, 19), np.int64)
    mask[1, 13:] = 0
    ids = np.where(mask == 1, ids, tcfg.pad_token_id)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask)
                  ).last_hidden_state.numpy()
    got = np.asarray(TextEncoder(tcfg).apply(
        {"params": params}, jnp.asarray(ids, np.int32),
        jnp.asarray(mask, np.int32)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_load_pretrained_hf_text_tower_dim_mismatch_raises(tmp_path):
    from facialmmt_tpu.checkpoint.torch_convert import (
        load_pretrained_hf_text_tower)
    from facialmmt_tpu.config import TextEncoderConfig

    tcfg = TextEncoderConfig.tiny("roberta")
    _save_tiny_hf_roberta(tmp_path / "plm", tcfg)
    wrong = dataclasses.replace(tcfg, hidden_size=tcfg.hidden_size * 2,
                                num_heads=8)
    with pytest.raises(ValueError, match="hidden_size"):
        load_pretrained_hf_text_tower(str(tmp_path / "plm"), wrong)


def test_trainer_pretrained_text_tower_missing_path_raises(tmp_path):
    from facialmmt_tpu.config import FacialMMTConfig, RuntimeConfig
    from facialmmt_tpu.train.trainer import Trainer
    from facialmmt_tpu.utils.observability import MetricWriter

    cfg = FacialMMTConfig.tiny().replace(
        pretrained_text_model_path=str(tmp_path / "nope"),
        runtime=RuntimeConfig(metrics_path=str(tmp_path / "m.jsonl")))
    trainer = Trainer(cfg, MetricWriter(cfg.runtime.metrics_path))
    with pytest.raises(FileNotFoundError):
        trainer._pretrained_text_tower()


def test_text_trainer_init_grafts_pretrained_plm(tmp_path, rng):
    """TextTrainer._init_text_params with the pretrained tree: the text-tower
    leaves ARE the HF weights while the rest of the model stays random-init."""
    import jax.numpy as jnp

    from facialmmt_tpu.config import FacialMMTConfig, RuntimeConfig
    from facialmmt_tpu.data.m3ed import M3edTextDataset
    from facialmmt_tpu.train.trainer import TextTrainer
    from facialmmt_tpu.utils.observability import MetricWriter

    cfg = FacialMMTConfig.tiny().replace(
        choice_modality="T",
        pretrained_text_model_path=str(tmp_path / "plm"),
        runtime=RuntimeConfig(metrics_path=str(tmp_path / "m.jsonl"),
                              compute_dtype="float32"))
    tcfg = cfg.text
    hf = _save_tiny_hf_roberta(tmp_path / "plm", tcfg)

    L = cfg.data.max_seq_length
    ids = rng.integers(2, tcfg.vocab_size, size=(3, L))
    sep = np.zeros((3, L), np.int64)
    sep[:, [10, 20, 30]] = 1
    labels = np.zeros((3, L), np.int64)
    ds = M3edTextDataset(ids, np.ones((3, L), np.int64), sep, labels)

    trainer = TextTrainer(cfg, MetricWriter(cfg.runtime.metrics_path))
    model = trainer._build_text_model()
    params = trainer._init_text_params(model, ds, 4,
                                       trainer._pretrained_text_tower())
    got = np.asarray(params["text_encoder"]["word_embeddings"]["embedding"])
    want = hf.embeddings.word_embeddings.weight.detach().numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    got_l0 = np.asarray(params["text_encoder"]["layer_0"]["query"]["kernel"])
    want_l0 = hf.encoder.layer[0].attention.self.query.weight.detach().numpy().T
    np.testing.assert_allclose(got_l0, want_l0, rtol=0, atol=0)


def test_resolve_pretrained_text_dir_default():
    """main.py resolves <pretrained_model_dir>/<plm_name> when the explicit
    flag is empty (reference main.py:118), training paths only."""
    import tempfile

    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.main import resolve_pretrained_text_dir

    with tempfile.TemporaryDirectory() as d:
        plm = os.path.join(d, "roberta-large")
        os.makedirs(plm)
        cfg = FacialMMTConfig.tiny().replace(do_eval=False,
                                             pretrained_text_model_path="")
        assert resolve_pretrained_text_dir(cfg, d) \
            .pretrained_text_model_path == plm
        # doEval: checkpoints carry the trained tower; no resolution
        assert resolve_pretrained_text_dir(
            cfg.replace(do_eval=True), d).pretrained_text_model_path == ""
        # V-only has no text tower
        assert resolve_pretrained_text_dir(
            cfg.replace(choice_modality="V"), d) \
            .pretrained_text_model_path == ""
        # explicit flag wins
        assert resolve_pretrained_text_dir(
            cfg.replace(pretrained_text_model_path="/x"), d) \
            .pretrained_text_model_path == "/x"
        # absent default dir -> unchanged (trainer warns + random-inits)
        assert resolve_pretrained_text_dir(
            cfg, os.path.join(d, "nope")).pretrained_text_model_path == ""


def test_multitask_trainer_grafts_pretrained_plm(tmp_path, rng):
    """run_multimodal's init grafts the pretrained text tower (reference
    src/models.py:72-77): after a 1-epoch tiny multi-task run, the best
    checkpoint's untouched embedding rows equal the HF weights exactly (the
    fixture's vocab use is sparse, so most rows receive no gradient)."""
    from facialmmt_tpu.config import FacialMMTConfig, OptimConfig, RuntimeConfig
    from facialmmt_tpu.data.affwild2 import AffwildDataset
    from facialmmt_tpu.data.meld import MeldMultimodalDataset, MeldTextArrays
    from facialmmt_tpu.data.text_prep import MeldTextPreprocessor
    from facialmmt_tpu.train.trainer import Trainer
    from facialmmt_tpu.utils.observability import MetricWriter
    from tests.fixtures import write_affwild_fixture

    for split in ("train", "val", "test"):
        write_meld_fixture(str(tmp_path), split=split, seed=hash(split) % 100)
    aux_fix = write_affwild_fixture(str(tmp_path / "aux"))

    tok = WhitespaceTokenizer()
    prep = MeldTextPreprocessor(tok, is_roberta=True, max_seq_length=64)

    def build(split):
        feats = prep.preprocess_split(
            os.path.join(tmp_path, f"{split}_sent_emo.csv"),
            os.path.join(tmp_path, f"{split}_text.json"))
        ids, mask, sep = MeldTextPreprocessor.to_arrays(feats)
        return MeldMultimodalDataset(str(tmp_path), split,
                                     MeldTextArrays(ids, mask, sep))

    cfg = FacialMMTConfig.tiny()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, max_seq_length=64),
        pretrained_text_model_path=str(tmp_path / "plm"),
        optim=OptimConfig(num_epochs=1, trg_batch_size=4,
                          trg_accumulation_steps=1, aux_batch_size=4,
                          warm_up=0.0),
        runtime=RuntimeConfig(
            save_model_path=str(tmp_path / "saved"), compute_dtype="float32",
            metrics_path=str(tmp_path / "m.jsonl"),
            aux_log_interval=2, trg_log_interval=2))
    hf = _save_tiny_hf_roberta(tmp_path / "plm", cfg.text)

    trainer = Trainer(cfg, MetricWriter(cfg.runtime.metrics_path))
    aux_ds = AffwildDataset(aux_fix["file_folder"], aux_fix["anno_folder"],
                            data_list=str(tmp_path / "aux_list.txt"))
    trainer.run_multimodal(aux_ds, build("train"), build("val"),
                           build("test"))

    from facialmmt_tpu.checkpoint.orbax_io import CheckpointManager

    best = CheckpointManager(str(tmp_path / "saved")).restore_best()
    emb = np.asarray(
        best["params"]["multimodal"]["text_encoder"]["word_embeddings"]
        ["embedding"])
    want = hf.embeddings.word_embeddings.weight.detach().numpy()
    # rows never touched by the fixture's token ids see only AdamW's
    # decoupled weight decay (applied to ALL params — reference semantics),
    # a ~1e-7 relative shrink per step; a random init differs at O(1)
    same_rows = np.all(np.isclose(emb, want, rtol=1e-4, atol=1e-6), axis=1)
    assert same_rows.sum() > emb.shape[0] // 2, (
        f"only {same_rows.sum()}/{emb.shape[0]} embedding rows match the "
        f"pretrained weights — text tower was not initialized from the PLM")
