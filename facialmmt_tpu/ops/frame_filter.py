"""Frame-importance filtering + repacking, as static masked ops.

The reference runs this as ~140 lines of per-frame Python loops inside the trainer
(reference train.py:60-133, mirrored at :169-234): confidence = <p, p> per frame,
frames with confidence <= 0.2 are dropped, survivors are repacked contiguously per
utterance, the vision mask is rebuilt, and each surviving frame's 7-d FER
distribution is concatenated onto its 512-d InceptionResnet feature (-> 519-d).
If every frame of an utterance is filtered, the utterance keeps all its frames
(reference train.py:122-133).

Here the whole thing is three fused XLA ops (reduce, stable argsort, gather) with
no host round-trip — the reference's per-batch device->host sync on Python scalars
(SURVEY.md §3.1) disappears entirely.

Batch semantics: the reference's repack bookkeeping (`margin`, train.py:88-111) is
only well-defined for batch_size=1 — one utterance per step.  This implementation
defines multi-utterance batches from first principles (each utterance filtered and
compacted independently), which is exactly equivalent to the reference at bs=1
(verified in tests/test_frame_filter.py against a literal re-derivation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def scatter_face_probs(flat_probs: jnp.ndarray, face_utt_id: jnp.ndarray,
                       face_pos: jnp.ndarray, num_utts: int,
                       max_faces: int) -> jnp.ndarray:
    """Scatter flat per-face FER distributions back to per-utterance layout.

    The face pipeline packs every real face of the batch contiguously into a
    static-capacity buffer (no pad compute through Swin).  flat_probs: (N, C);
    face_utt_id: (N,) utterance index of each slot (-1 for pad slots);
    face_pos: (N,) frame index within the utterance.
    Returns (num_utts, max_faces, C).
    """
    valid = (face_utt_id >= 0) & (face_pos < max_faces)
    safe_utt = jnp.where(valid, face_utt_id, 0)
    safe_pos = jnp.where(valid, face_pos, 0)
    out = jnp.zeros((num_utts, max_faces, flat_probs.shape[-1]), flat_probs.dtype)
    contrib = flat_probs * valid[:, None].astype(flat_probs.dtype)
    return out.at[safe_utt, safe_pos].add(contrib)


@partial(jax.jit, static_argnames=())
def frame_importance_filter(vision_feats: jnp.ndarray, probs: jnp.ndarray,
                            face_mask: jnp.ndarray, threshold):
    """Filter + compact + concat, per utterance.

    vision_feats: (B, F, D)  InceptionResnet features per frame;
    probs:        (B, F, C)  FER distributions per frame (zeros on pad frames);
    face_mask:    (B, F)     1 where a real frame exists;
    threshold:    scalar     confidence cut (reference --FacialEmoImpor_threshold).

    Returns (vision_concat (B, F, D+C), new_mask (B, F)):
      * keep = (sum(p^2) > threshold) & mask, with all-filtered fallback to the
        full mask (reference train.py:83-133);
      * kept frames are compacted to the front in original order (stable argsort
        permutation — static-shape equivalent of the reference's repack loop);
      * dropped slots are zero, matching the reference's zero-initialized
        new_vision_inputs / batch_vis_emo buffers.
    """
    face_mask = face_mask.astype(bool)
    conf = jnp.sum(jnp.square(probs.astype(jnp.float32)), axis=-1)   # (B, F)
    keep = (conf > threshold) & face_mask

    # all-filtered fallback: keep every real frame of that utterance
    any_kept = jnp.any(keep, axis=1, keepdims=True)
    keep = jnp.where(any_kept, keep, face_mask)

    # stable compaction permutation: kept frames first, original order preserved
    order = jnp.argsort(jnp.logical_not(keep), axis=1, stable=True)  # (B, F)
    kept_count = jnp.sum(keep, axis=1)                               # (B,)
    new_mask = (jnp.arange(keep.shape[1])[None, :] < kept_count[:, None])

    new_feats = jnp.take_along_axis(vision_feats, order[:, :, None], axis=1)
    new_probs = jnp.take_along_axis(probs, order[:, :, None], axis=1)
    m = new_mask[:, :, None].astype(vision_feats.dtype)
    out = jnp.concatenate([new_feats * m, new_probs.astype(vision_feats.dtype) * m],
                          axis=-1)
    return out, new_mask.astype(jnp.int32)
