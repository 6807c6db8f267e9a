"""Metrics cross-checks vs sklearn (the reference's metric backend,
utils/eval_metrics.py:16-28)."""

import numpy as np
import pytest

from facialmmt_tpu.train.metrics import (eval_meld, macro_f1, per_class_f1,
                                         weighted_f1)

sklearn = pytest.importorskip("sklearn.metrics")


def test_weighted_f1_matches_sklearn(rng):
    for _ in range(20):
        n = int(rng.integers(5, 200))
        y_true = rng.integers(0, 7, size=n)
        y_pred = rng.integers(0, 7, size=n)
        want = sklearn.f1_score(y_true, y_pred, average="weighted")
        got = weighted_f1(y_true, y_pred)
        np.testing.assert_allclose(got, want, rtol=1e-9)


def test_weighted_f1_missing_classes(rng):
    """Classes absent from y_true but present in y_pred (and vice versa)."""
    y_true = np.array([0, 0, 1, 1, 1])
    y_pred = np.array([0, 2, 1, 1, 6])
    want = sklearn.f1_score(y_true, y_pred, average="weighted")
    np.testing.assert_allclose(weighted_f1(y_true, y_pred), want, rtol=1e-9)


def test_macro_f1_matches_sklearn(rng):
    y_true = rng.integers(0, 5, size=100)
    y_pred = rng.integers(0, 5, size=100)
    want = sklearn.f1_score(y_true, y_pred, average="macro")
    np.testing.assert_allclose(macro_f1(y_true, y_pred), want, rtol=1e-9)


def test_per_class_f1_matches_sklearn(rng):
    y_true = rng.integers(0, 7, size=300)
    y_pred = rng.integers(0, 7, size=300)
    want = sklearn.f1_score(y_true, y_pred, average=None)
    np.testing.assert_allclose(per_class_f1(y_true, y_pred), want, rtol=1e-9)


def test_eval_meld_argmax_path(rng):
    logits = rng.normal(size=(50, 7))
    truths = rng.integers(0, 7, size=50)
    want = sklearn.f1_score(truths, logits.argmax(-1), average="weighted")
    got = eval_meld(logits, truths, test=False)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_eval_step_macs_sane():
    """FLOPs accounting (utils/flops.py): dominant terms are Swin-per-face and
    text-tower-per-dialogue; the analytic count must scale linearly in each."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.ops.swin import swin_flops
    from facialmmt_tpu.utils.flops import eval_step_macs

    cfg = FacialMMTConfig()
    base = eval_step_macs(cfg, 128, 16, 512)
    # +1 face adds exactly one Swin pass
    assert eval_step_macs(cfg, 128, 16, 513) - base == swin_flops(cfg.swin)
    # doubling dialogues adds the text-tower term once more
    text = eval_step_macs(cfg, 128, 32, 512) - base
    assert text > 0
    # roberta-large @512 is ~167 GMACs/dialogue (~335 GFLOPs); wide tolerance
    assert 100e9 < text / 16 < 250e9
    # per-utterance fusion terms are small but nonzero
    assert eval_step_macs(cfg, 129, 16, 512) > base
