"""Tests for vectorized utterance span extraction against a literal re-derivation of
the reference Python loop (src/models.py:117-150)."""

import jax.numpy as jnp
import numpy as np

from facialmmt_tpu.ops.span_extract import extract_utt_spans, spans_from_sep_mask


def reference_span_loop(text_feats, sep_mask, utt_idx, max_utt_len, is_roberta):
    """Faithful per-element re-derivation of the reference loop semantics."""
    b, L, h = text_feats.shape
    out = np.zeros((b, max_utt_len, h), text_feats.dtype)
    out_mask = np.zeros((b, max_utt_len), np.int64)
    for i in range(b):
        u = int(utt_idx[i])
        seps = [j for j in range(L) if sep_mask[i, j] == 1]
        if u == 0:
            if not seps:
                continue
            length = min(seps[0] - 1, max_utt_len)
            out[i, :length] = text_feats[i, 1:1 + length]
            out_mask[i, :length] = 1
        else:
            if len(seps) < u + 1:
                continue
            pre, cur = seps[u - 1], seps[u]
            off = 2 if is_roberta else 1
            length = min(cur - pre - off, max_utt_len)
            out[i, :length] = text_feats[i, pre + off:pre + off + length]
            out_mask[i, :length] = 1
    return out, out_mask


def make_dialogue_sep_mask(rng, L, n_utts, is_roberta):
    """Build a plausible sep mask: utterances of random token lengths joined as
    <s>u1</s></s>u2</s>... (roberta) or [CLS]u1[SEP]u2[SEP]... (bert)."""
    mask = np.zeros(L, np.int64)
    pos = 0
    pos += 1  # <s>/[CLS]
    for k in range(n_utts):
        tok = int(rng.integers(1, 9))
        if k == 0:
            pos += tok
            mask[pos] = 1
            pos += 1
        else:
            if is_roberta:
                pos += 1  # the opening </s>
            pos += tok
            if pos >= L:
                break
            mask[pos] = 1
            pos += 1
    return mask


def test_span_extract_matches_reference_loop(rng):
    for is_roberta in (True, False):
        L, h, T = 64, 8, 6
        b = 12
        feats = rng.normal(size=(b, L, h)).astype(np.float32)
        sep = np.stack([make_dialogue_sep_mask(rng, L, int(rng.integers(1, 6)),
                                               is_roberta) for _ in range(b)])
        n_seps = sep.sum(1)
        utt_idx = np.array([int(rng.integers(0, max(n, 1))) for n in n_seps])

        got, got_mask = extract_utt_spans(
            jnp.asarray(feats), jnp.asarray(sep), jnp.asarray(utt_idx),
            max_utt_len=T, is_roberta=is_roberta)
        want, want_mask = reference_span_loop(feats, sep, utt_idx, T, is_roberta)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                                   err_msg=f"roberta={is_roberta}")
        np.testing.assert_array_equal(np.asarray(got_mask), want_mask)


def test_span_truncated_dialogue_yields_zero_row(rng):
    """Target utterance beyond the last sep => all-zero row (the reference loop
    never breaks)."""
    L, h, T = 16, 4, 5
    feats = rng.normal(size=(1, L, h)).astype(np.float32)
    sep = np.zeros((1, L), np.int64)
    sep[0, 5] = 1  # only one utterance survived truncation
    got, mask = extract_utt_spans(jnp.asarray(feats), jnp.asarray(sep),
                                  jnp.asarray([3]), max_utt_len=T, is_roberta=True)
    assert np.all(np.asarray(got) == 0)
    assert np.all(np.asarray(mask) == 0)


def test_spans_valid_flag():
    sep = np.zeros((2, 10), np.int64)
    sep[0, 4] = 1
    sep[1, 3] = sep[1, 7] = 1
    start, length, valid = spans_from_sep_mask(
        jnp.asarray(sep), jnp.asarray([0, 1]), True)
    assert bool(valid[0]) and bool(valid[1])
    assert int(start[1]) == 5 and int(length[1]) == 2  # 7 - 3 - 2
