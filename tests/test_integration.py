"""End-to-end integration tests on synthetic fixtures (SURVEY.md §4b):
the minimum slice (V-only) through the real CLI, including torch whole-module-
pickle doEval parity, and a tiny multi-task T+A+V training run."""

import os
import sys

import numpy as np
import pytest
import torch

from tests.fixtures import (WhitespaceTokenizer, write_affwild_fixture,
                            write_meld_fixture)

REFERENCE = "/root/reference"


def _cli(tmp_path, extra):
    from facialmmt_tpu.main import run

    argv = [
        "--data_load_path", str(tmp_path),
        "--save_Model_path", str(tmp_path / "saved_model"),
        "--metrics_path", str(tmp_path / "metrics.jsonl"),
        "--hidden_size", "64", "--num_attention_heads", "4",
        "--intermediate_size", "128",
        "--compute_dtype", "float32",
        "--trg_log_interval", "2",
    ] + extra
    return run(argv)


def test_cli_unimodal_train_eval(tmp_path):
    """V-only training from scratch through the CLI: 2 epochs on synthetic
    features -> finite test W-F1, best checkpoint written, metrics logged."""
    for split in ("train", "val", "test"):
        write_meld_fixture(str(tmp_path), split=split, seed=hash(split) % 100)
    wf1 = _cli(tmp_path, ["--choice_modality", "V", "--doEval", "0",
                          "--num_epochs", "2", "--trg_batch_size", "4",
                          "--trg_accumulation_steps", "1",
                          "--trg_lr", "1e-3"])
    assert 0.0 <= wf1 <= 1.0
    saved = os.listdir(tmp_path / "saved_model")
    assert any(s.startswith("best_") for s in saved)
    assert (tmp_path / "metrics.jsonl").exists()


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference tree")
def test_cli_unimodal_doeval_torch_pickle_parity(tmp_path, rng):
    """doEval from a torch WHOLE-MODULE pickle of the reference's unimodal
    model: the CLI must convert it and reproduce the torch W-F1 exactly."""
    import types

    import facialmmt_tpu.checkpoint.torch_convert as tc

    try:
        tc.load_torch_state_dict("/nonexistent")  # install timm stub
    except Exception:
        pass
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    torch.Tensor.cuda = lambda self, *a, **k: self

    fix = write_meld_fixture(str(tmp_path), split="test", seed=7)

    # build the reference unimodal model on the fixture's dims
    import src.models as ref_models

    args = types.SimpleNamespace(
        num_labels=7, vision_featExtr_dim=16, vision_utt_Transformernum=2,
        get_vision_utt_max_lens=6, hidden_size=64, hidden_dropout_prob=0.1,
        num_attention_heads=4, intermediate_size=128,
        attention_probs_dropout_prob=0.1, layer_norm_eps=1e-12)
    torch.manual_seed(0)
    ref = ref_models.meld_utt_transformer(args).eval()

    os.makedirs(tmp_path / "pretrained_model", exist_ok=True)
    torch.save(ref, tmp_path / "pretrained_model" / "unimodal_model_V.pt",
               pickle_protocol=4)

    # torch-side golden W-F1 on the same fixture
    import pickle

    with open(tmp_path / "V" / "meld_test_vision_utt.pkl", "rb") as f:
        data = pickle.load(f)["test"]
    feats = torch.from_numpy(np.asarray(data["vision"], np.float32))
    mask = torch.from_numpy(np.asarray(data["vision_utt_mask"], np.float32))
    with torch.no_grad():
        want_logits = ref(feats, mask).numpy()
    from facialmmt_tpu.train.metrics import eval_meld

    want_f1 = eval_meld(want_logits, np.asarray(data["labels"]), test=False)

    wf1 = _cli(tmp_path, ["--choice_modality", "V", "--doEval", "1",
                          "--pretrained_model_dir",
                          str(tmp_path / "pretrained_model"),
                          "--vision_utt_Transformernum", "2"])
    np.testing.assert_allclose(wf1, want_f1, atol=1e-6)


def test_trainer_multimodal_multitask_epoch(tmp_path, rng):
    """One multi-task epoch (aux FER pass + target pass + val + test) on tiny
    fixtures with the tiny config — exercises the full reference loop shape."""
    import dataclasses

    from facialmmt_tpu.config import FacialMMTConfig, OptimConfig, RuntimeConfig
    from facialmmt_tpu.data.affwild2 import AffwildDataset
    from facialmmt_tpu.data.meld import MeldMultimodalDataset, MeldTextArrays
    from facialmmt_tpu.data.text_prep import MeldTextPreprocessor
    from facialmmt_tpu.train.trainer import Trainer
    from facialmmt_tpu.utils.observability import MetricWriter

    for split in ("train", "val", "test"):
        fix = write_meld_fixture(str(tmp_path), split=split,
                                 seed=hash(split) % 100)
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
        optim=OptimConfig(num_epochs=1, trg_batch_size=4,
                          trg_accumulation_steps=1, aux_batch_size=4,
                          warm_up=0.0),
        runtime=RuntimeConfig(
            save_model_path=str(tmp_path / "saved"), compute_dtype="float32",
            metrics_path=str(tmp_path / "m.jsonl"),
            aux_log_interval=2, trg_log_interval=2))

    trainer = Trainer(cfg, MetricWriter(cfg.runtime.metrics_path))
    aux_ds = AffwildDataset(aux_fix["file_folder"], aux_fix["anno_folder"],
                            data_list=str(tmp_path / "aux_list.txt"))
    test_f1 = trainer.run_multimodal(aux_ds, build("train"), build("val"),
                                     build("test"))
    assert 0.0 <= test_f1 <= 1.0
    assert any(s.startswith("best_")
               for s in os.listdir(tmp_path / "saved"))


def _write_text_caches(tmp_path, splits, max_seq_length=64):
    """Pre-populate the CLI's tokenized-text npz cache so the T+A+V CLI paths
    run without a HF tokenizer (main.py build_split)."""
    from facialmmt_tpu.data.text_prep import MeldTextPreprocessor

    tok = WhitespaceTokenizer()
    prep = MeldTextPreprocessor(tok, is_roberta=True,
                                max_seq_length=max_seq_length)
    for split in splits:
        feats = prep.preprocess_split(
            os.path.join(tmp_path, f"{split}_sent_emo.csv"),
            os.path.join(tmp_path, f"{split}_text.json"))
        ids, mask, sep = MeldTextPreprocessor.to_arrays(feats)
        np.savez(os.path.join(tmp_path, "T+A+V",
                              f"text_{split}_roberta-large.npz"),
                 ids=ids, mask=mask, sep=sep)


def test_cli_dialogue_train_then_doeval_submission(tmp_path):
    """The full appendix dia-level CLI flow (reference
    (Appendix)CCAC2023/train.py:100-194): train --uttORdia dia, then doEval
    restores the best checkpoint, fills the competition submission CSV from the
    template and writes the pred/true dump."""
    import csv

    splits = ("train", "val", "test")
    for split in splits:
        write_meld_fixture(str(tmp_path), split=split, seed=hash(split) % 100)
    _write_text_caches(tmp_path, splits)

    common = ["--choice_modality", "T+A+V", "--uttORdia", "dia",
              "--text_preset", "tiny", "--max_seq_length", "64",
              "--crossmodal_num_heads_TA", "4",
              "--crossmodal_num_heads_TA_V", "4",
              "--trg_batch_size", "2"]
    f1_train = _cli(tmp_path, common + ["--doEval", "0", "--num_epochs", "1",
                                        "--trg_lr", "1e-3"])
    assert 0.0 <= f1_train <= 1.0
    assert any(s.startswith("best_")
               for s in os.listdir(tmp_path / "saved_model"))

    # submission template: one row per test utterance (9 in the fixture)
    template = tmp_path / "nustm_submission_empty.csv"
    with open(template, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "emotion"])
        for i in range(9):
            w.writerow([i, ""])

    out_csv = tmp_path / "nustm_submission.csv"
    dump = tmp_path / "pred_true.txt"
    f1_eval = _cli(tmp_path, common + [
        "--doEval", "1",
        "--load_best_model_path", str(tmp_path / "saved_model"),
        "--submission_template", str(template),
        "--submission_out", str(out_csv),
        "--pred_dump_path", str(dump)])
    assert 0.0 <= f1_eval <= 1.0

    from facialmmt_tpu.utils.submission import M3ED_EMOTIONS

    with open(out_csv, newline="") as f:
        rows = list(csv.reader(f))[1:]
    assert len(rows) == 9
    assert all(r[1] in M3ED_EMOTIONS for r in rows)
    with open(dump) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 9


def test_trainer_multimodal_joint_microbatch(tmp_path, rng):
    """Joint training (swin_from_target=True) with trg_accumulation_steps=2
    runs the microbatch-scan step end-to-end and updates Swin from the target
    loss (VERDICT r1 weak #3)."""
    import dataclasses

    from facialmmt_tpu.config import FacialMMTConfig, OptimConfig, RuntimeConfig
    from facialmmt_tpu.data.affwild2 import AffwildDataset
    from facialmmt_tpu.data.meld import MeldMultimodalDataset, MeldTextArrays
    from facialmmt_tpu.data.text_prep import MeldTextPreprocessor
    from facialmmt_tpu.train.trainer import Trainer
    from facialmmt_tpu.utils.observability import MetricWriter

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
        swin_from_target=True,
        data=dataclasses.replace(cfg.data, max_seq_length=64),
        optim=OptimConfig(num_epochs=1, trg_batch_size=2,
                          trg_accumulation_steps=2, aux_batch_size=4,
                          aux_accumulation_steps=2, warm_up=0.0),
        runtime=RuntimeConfig(
            save_model_path=str(tmp_path / "saved"), compute_dtype="float32",
            metrics_path="", aux_log_interval=100, trg_log_interval=100))

    trainer = Trainer(cfg, MetricWriter("", also_print=False))
    aux_ds = AffwildDataset(aux_fix["file_folder"], aux_fix["anno_folder"],
                            data_list=str(tmp_path / "aux_list.txt"))
    test_f1 = trainer.run_multimodal(aux_ds, build("train"), build("val"),
                                     build("test"))
    assert 0.0 <= test_f1 <= 1.0
