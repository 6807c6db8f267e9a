"""Vectorized per-utterance word-span extraction from dialogue encodings.

The reference extracts each utterance's word-level span from the whole-dialogue
RoBERTa/BERT output with a per-batch-element Python loop over the sep mask
(reference src/models.py:117-150).  That loop is O(batch * seq) on the host and
breaks jit.  Here the same arithmetic is closed-form over cumulative sums of the
sep mask, so it's one gather — fully batched, static-shape, differentiable.

Reference span arithmetic (src/models.py:126-148):
  * sep positions s_0 < s_1 < ... are where sep_mask == 1 (the utterance-final
    </s> / [SEP] markers, src/meld_bert_extraText.py:97-112);
  * utterance u == 0:  start = 1,            length = s_0 - 1
  * utterance u  > 0:  roberta: start = s_{u-1} + 2, length = s_u - s_{u-1} - 2
                       bert:    start = s_{u-1} + 1, length = s_u - s_{u-1} - 1
  * length is clamped to text_utt_max_len (38, utils/dataset.py:24);
  * if the dialogue was truncated so hard that utterance u has no sep, the row
    stays all-zero (the reference loop never hits its break).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def spans_from_sep_mask(sep_mask: jnp.ndarray, utt_idx: jnp.ndarray,
                        is_roberta: bool):
    """Compute (start, length, valid) of each target utterance's word span.

    sep_mask: (B, L) int {0,1};  utt_idx: (B,) position of the target utterance in
    its dialogue.  Returns three (B,) arrays.
    """
    sep_mask = sep_mask.astype(jnp.int32)
    csum = jnp.cumsum(sep_mask, axis=1)                  # (B, L) count incl. self
    num_seps = csum[:, -1]                               # (B,)
    positions = jnp.arange(sep_mask.shape[1], dtype=jnp.int32)[None, :]

    def sep_position(n):
        """position of the n-th (1-indexed) sep; 0 if absent."""
        hit = (sep_mask == 1) & (csum == n[:, None])
        return jnp.sum(jnp.where(hit, positions, 0), axis=1)

    s_u = sep_position(utt_idx + 1)          # sep closing the target utterance
    s_prev = sep_position(utt_idx)           # sep closing the previous one

    off = 2 if is_roberta else 1
    start0 = jnp.ones_like(s_u)
    len0 = s_u - 1
    startu = s_prev + off
    lenu = s_u - s_prev - off

    is_first = utt_idx == 0
    start = jnp.where(is_first, start0, startu)
    length = jnp.where(is_first, len0, lenu)
    valid = num_seps >= (utt_idx + 1)
    length = jnp.where(valid, jnp.maximum(length, 0), 0)
    return start, length, valid


@partial(jax.jit, static_argnames=("max_utt_len", "is_roberta"))
def extract_utt_spans(text_feats: jnp.ndarray, sep_mask: jnp.ndarray,
                      utt_idx: jnp.ndarray, *, max_utt_len: int,
                      is_roberta: bool):
    """Gather each target utterance's word-level features.

    text_feats: (B, L, H) dialogue-level features (already through text_linear);
    sep_mask:   (B, L);  utt_idx: (B,).
    Returns (feats (B, T, H), mask (B, T)) with T = max_utt_len; rows are
    zero-padded past each utterance's true length, matching the reference's
    zero-initialized batch_text_feat_update (src/models.py:114-115).
    """
    start, length, _ = spans_from_sep_mask(sep_mask, utt_idx, is_roberta)
    length = jnp.minimum(length, max_utt_len)            # clamp (src/models.py:128-129)

    t = jnp.arange(max_utt_len, dtype=jnp.int32)[None, :]          # (1, T)
    gather_idx = jnp.clip(start[:, None] + t, 0, text_feats.shape[1] - 1)
    out = jnp.take_along_axis(text_feats, gather_idx[:, :, None], axis=1)
    mask = (t < length[:, None])
    out = out * mask[:, :, None].astype(out.dtype)
    return out, mask.astype(jnp.int32)
