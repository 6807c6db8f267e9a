"""Tests for the vectorized frame-importance filter against a literal re-derivation
of the reference bs=1 repack loop (train.py:60-133)."""

import jax.numpy as jnp
import numpy as np

from facialmmt_tpu.ops.frame_filter import (frame_importance_filter,
                                            scatter_face_probs)


def reference_filter_single_utt(vision, probs, n_imgs, threshold):
    """Faithful per-utterance (bs=1) re-derivation of reference train.py:73-133.

    vision: (F, D) padded features; probs: (n_imgs, C) swin distributions for the
    real faces; n_imgs: number of real faces.  Returns (concat (F, D+C), mask (F,)).
    """
    F, D = vision.shape
    C = probs.shape[1]
    conf = (probs * probs).sum(1)
    keep_idx = [i for i in range(n_imgs) if conf[i] > threshold]
    vis_emo = np.zeros((F, C), np.float32)
    if keep_idx:
        new_mask = np.zeros(F, np.int64)
        new_vision = np.zeros_like(vision)
        for j, orig in enumerate(keep_idx):
            new_mask[j] = 1
            vis_emo[j] = probs[orig]
            new_vision[j] = vision[orig]
        return np.concatenate([new_vision, vis_emo], -1), new_mask
    # all filtered: keep original inputs, distributions at original positions
    mask = (np.arange(F) < n_imgs).astype(np.int64)
    for j in range(n_imgs):
        vis_emo[j] = probs[j]
    return np.concatenate([vision, vis_emo], -1), mask


def run_case(rng, F, D, C, n_imgs, probs_scale, threshold=0.2):
    vision = rng.normal(size=(F, D)).astype(np.float32)
    vision[n_imgs:] = 0
    raw = rng.random((n_imgs, C)).astype(np.float32) * probs_scale + 1e-3
    probs = raw / raw.sum(1, keepdims=True)
    # sharpen a random subset so some frames pass the threshold sometimes
    for i in range(n_imgs):
        if rng.random() < 0.5:
            probs[i] = probs[i] ** 8
            probs[i] /= probs[i].sum()

    padded_probs = np.zeros((F, C), np.float32)
    padded_probs[:n_imgs] = probs
    face_mask = (np.arange(F) < n_imgs).astype(np.int32)

    got, got_mask = frame_importance_filter(
        jnp.asarray(vision[None]), jnp.asarray(padded_probs[None]),
        jnp.asarray(face_mask[None]), threshold)
    want, want_mask = reference_filter_single_utt(vision, probs, n_imgs, threshold)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_mask)[0], want_mask)


def test_filter_matches_reference_bs1(rng):
    for _ in range(25):
        F = int(rng.integers(2, 12))
        n = int(rng.integers(1, F + 1))
        run_case(rng, F=F, D=6, C=7, n_imgs=n, probs_scale=1.0)


def test_filter_all_filtered_fallback(rng):
    """Uniform distributions (conf ~ 1/7 = 0.14 < 0.2) => keep-all fallback."""
    F, D, C, n = 6, 4, 7, 4
    vision = rng.normal(size=(F, D)).astype(np.float32)
    vision[n:] = 0
    probs = np.full((F, C), 1.0 / C, np.float32)
    probs[n:] = 0
    face_mask = (np.arange(F) < n).astype(np.int32)
    got, mask = frame_importance_filter(
        jnp.asarray(vision[None]), jnp.asarray(probs[None]),
        jnp.asarray(face_mask[None]), 0.2)
    np.testing.assert_array_equal(np.asarray(mask)[0], face_mask)
    np.testing.assert_allclose(np.asarray(got)[0, :n, :D], vision[:n], rtol=1e-6)


def test_filter_batched_independence(rng):
    """Multi-utterance batches behave as independent per-utterance filters."""
    F, D, C = 8, 5, 7
    cases = []
    for _ in range(4):
        n = int(rng.integers(1, F + 1))
        vision = rng.normal(size=(F, D)).astype(np.float32)
        vision[n:] = 0
        raw = rng.random((F, C)).astype(np.float32) + 1e-3
        raw[n:] = 0
        probs = np.where(np.arange(F)[:, None] < n,
                         raw / np.maximum(raw.sum(1, keepdims=True), 1e-9), 0)
        cases.append((vision, probs.astype(np.float32),
                      (np.arange(F) < n).astype(np.int32)))
    vis = jnp.asarray(np.stack([c[0] for c in cases]))
    pr = jnp.asarray(np.stack([c[1] for c in cases]))
    fm = jnp.asarray(np.stack([c[2] for c in cases]))
    batched_out, batched_mask = frame_importance_filter(vis, pr, fm, 0.2)
    for i, (v, p, m) in enumerate(cases):
        single_out, single_mask = frame_importance_filter(
            jnp.asarray(v[None]), jnp.asarray(p[None]), jnp.asarray(m[None]), 0.2)
        np.testing.assert_allclose(np.asarray(batched_out)[i],
                                   np.asarray(single_out)[0], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(batched_mask)[i],
                                      np.asarray(single_mask)[0])


def test_scatter_face_probs(rng):
    flat = rng.random((6, 7)).astype(np.float32)
    utt_id = np.array([0, 0, 1, 1, 1, -1])
    pos = np.array([0, 1, 0, 1, 2, 0])
    out = np.asarray(scatter_face_probs(jnp.asarray(flat), jnp.asarray(utt_id),
                                        jnp.asarray(pos), 2, 4))
    np.testing.assert_allclose(out[0, 0], flat[0])
    np.testing.assert_allclose(out[0, 1], flat[1])
    np.testing.assert_allclose(out[1, 2], flat[4])
    assert np.all(out[0, 2:] == 0)
    assert np.all(out[1, 3] == 0)
