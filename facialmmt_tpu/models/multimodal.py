"""Multimodal fusion model (reference src/models.py:41-188) and the fused
end-to-end composition that folds the Swin FER branch + frame filter into one
jitted program.

Structure (T+A+V, crossmodal fuse):
  text: dialogue -> TextEncoder -> Linear(->768) -> per-utterance span extraction
        (vectorized; replaces the reference's host loop, src/models.py:117-150);
  audio: Linear(768->768) -> 5-layer post-LN self-attn encoder;
  vision: Linear(519->768) -> 2-layer post-LN self-attn encoder
        (519 = InceptionResnet 512 + 7-d FER distribution, src/models.py:67);
  fusion: ONE shared CrossModalTrans_TA applied in both T->A and A->T directions,
        concat on the sequence axis, then ONE shared CrossModalTrans_TA_V applied
        (T|A)<->V both ways (reference src/models.py:168-183; weight sharing and
        the absence of key-padding masks inside the crossmodal encoders are
        deliberate reference semantics, SURVEY.md §7 parity checklist);
  pool: additive attention over the concatenated mask -> dropout -> classifier.

Encode-once-gather-many: the reference re-encodes the full dialogue once per
member utterance (SURVEY.md §3.1 calls this out as a major redundancy).  Here the
text tower takes the batch's UNIQUE dialogues (num_dia, L) and a per-utterance
dia_idx gather vector, so a dialogue is encoded once per step regardless of how
many of its utterances are in the batch.  Passing num_dia == batch and
dia_idx == arange reproduces the reference behavior exactly.

Appendix generalizations (reference (Appendix)CCAC2023/src/models.py:10-225) are
first-class here: `choice_modality` in {T+A+V, T+A, T+V} and
`modality_fuse` in {crossmodal, concat}.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from facialmmt_tpu.config import FacialMMTConfig, resolve_text_config
from facialmmt_tpu.models.text_encoder import TextEncoder
from facialmmt_tpu.ops.crossmodal import CrossModalTransformerEncoder
from facialmmt_tpu.ops.encoder import UttTransEncoder
from facialmmt_tpu.ops.layers import AdditiveAttention, TorchLinear
from facialmmt_tpu.ops.span_extract import extract_utt_spans

Dtype = Any


class MultiModalTransformerForClassification(nn.Module):
    config: FacialMMTConfig
    dtype: Optional[Dtype] = None

    def _crossmodal(self, cm_cfg, name):
        return CrossModalTransformerEncoder(
            embed_dim=self.config.hidden_size, num_heads=cm_cfg.num_heads,
            layers=cm_cfg.layers, attn_dropout=cm_cfg.attn_dropout,
            gelu_dropout=cm_cfg.gelu_dropout, res_dropout=cm_cfg.res_dropout,
            embed_dropout=cm_cfg.embed_dropout, attn_mask=cm_cfg.attn_mask,
            fused_attention=cm_cfg.fused_attention,
            max_positions=max(self.config.data.text_utt_max_len
                              + self.config.data.audio_utt_max_len
                              + self.config.data.vision_utt_max_len, 16),
            dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, dia_input_ids, dia_input_mask, dia_sep_mask,
                 audio_inputs=None, audio_mask=None,
                 vision_inputs=None, vision_mask=None,
                 utt_in_dia_idx=None, dia_idx=None, *,
                 deterministic: bool = True):
        """dia_*: (num_dia, L) unique dialogues; utt_in_dia_idx: (B,) position of
        each target utterance in its dialogue; dia_idx: (B,) gather index into the
        unique-dialogue axis (None => arange, the reference's 1:1 layout).
        vision_inputs: (B, F, vision_feat_dim + num_labels), already filtered and
        FER-concatenated (see FusedFacialMMT / ops.frame_filter).
        Returns logits (B, num_labels).
        """
        cfg = self.config
        h = cfg.hidden_size
        use_audio = "A" in cfg.choice_modality
        use_vision = "V" in cfg.choice_modality

        # ---- text tower: encode unique dialogues once, gather per utterance ----
        text_cfg = resolve_text_config(cfg)
        enc_out = TextEncoder(text_cfg, dtype=self.dtype, name="text_encoder")(
            dia_input_ids, dia_input_mask, deterministic=deterministic)
        text_lin = TorchLinear(h, dtype=self.dtype, name="text_linear")(enc_out)
        if dia_idx is not None:
            text_lin = jnp.take(text_lin, dia_idx, axis=0)
            dia_sep_mask = jnp.take(dia_sep_mask, dia_idx, axis=0)
        text_feat, text_mask = extract_utt_spans(
            text_lin, dia_sep_mask, utt_in_dia_idx,
            max_utt_len=cfg.data.text_utt_max_len,
            is_roberta=(text_cfg.model_type == "roberta"))

        # ---- audio tower ----
        if use_audio:
            a = TorchLinear(h, dtype=self.dtype, name="audio_linear")(audio_inputs)
            audio_trans = UttTransEncoder(
                cfg.encoder, cfg.audio_utt_transformer_num,
                cfg.data.audio_utt_max_len, dtype=self.dtype,
                name="audio_utt_transformer")(a, audio_mask,
                                              deterministic=deterministic)

        # ---- vision tower ----
        if use_vision:
            v = TorchLinear(h, dtype=self.dtype, name="vision_linear")(vision_inputs)
            vision_trans = UttTransEncoder(
                cfg.encoder, cfg.vision_utt_transformer_num,
                cfg.data.vision_utt_max_len, dtype=self.dtype,
                name="vision_utt_transformer")(v, vision_mask,
                                               deterministic=deterministic)

        pool = AdditiveAttention(h, h, dtype=self.dtype, name="attention")

        if not use_audio and not use_vision:
            # text-only (appendix choice_modality 'T', reference
            # (Appendix)CCAC2023/utils/dataset.py:112-147 feeds only the text
            # tower): span-extracted utterance tokens -> pool -> classifier
            pooled, _ = pool(text_feat, text_mask)
        elif cfg.modality_fuse == "crossmodal":
            if use_audio:
                cm_ta = self._crossmodal(cfg.crossmodal_ta, "CrossModalTrans_TA")
                t_x_a = cm_ta(text_feat, audio_trans, audio_trans,
                              deterministic=deterministic)
                a_x_t = cm_ta(audio_trans, text_feat, text_feat,
                              deterministic=deterministic)
                ta = jnp.concatenate([t_x_a, a_x_t], axis=1)
                if use_vision:
                    cm_tav = self._crossmodal(cfg.crossmodal_ta_v,
                                              "CrossModalTrans_TA_V")
                    v_x_ta = cm_tav(vision_trans, ta, ta,
                                    deterministic=deterministic)
                    ta_x_v = cm_tav(ta, vision_trans, vision_trans,
                                    deterministic=deterministic)
                    final_feat = jnp.concatenate([ta_x_v, v_x_ta], axis=1)
                    final_mask = jnp.concatenate(
                        [text_mask, audio_mask, vision_mask], axis=1)
                else:  # T+A
                    final_feat = ta
                    final_mask = jnp.concatenate([text_mask, audio_mask], axis=1)
            else:  # T+V (appendix)
                cm_tv = self._crossmodal(cfg.crossmodal_ta, "CrossModalTrans_TV")
                t_x_v = cm_tv(text_feat, vision_trans, vision_trans,
                              deterministic=deterministic)
                v_x_t = cm_tv(vision_trans, text_feat, text_feat,
                              deterministic=deterministic)
                final_feat = jnp.concatenate([t_x_v, v_x_t], axis=1)
                final_mask = jnp.concatenate([text_mask, vision_mask], axis=1)
            pooled, _ = pool(final_feat, final_mask)
        elif cfg.modality_fuse == "concat":
            # appendix concat fusion ((Appendix)CCAC2023/src/models.py:211-221):
            # pool each stream separately, concat, linear down to hidden
            parts = [pool(text_feat, text_mask)[0]]
            if use_audio:
                parts.append(pool(audio_trans, audio_mask)[0])
            if use_vision:
                parts.append(pool(vision_trans, vision_mask)[0])
            pooled = TorchLinear(h, dtype=self.dtype, name="multimodal_linear")(
                jnp.concatenate(parts, axis=-1))
        else:
            raise ValueError(f"unknown modality_fuse {cfg.modality_fuse!r}")

        pooled = nn.Dropout(cfg.encoder.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        return TorchLinear(cfg.num_labels, dtype=self.dtype,
                           name="classifier")(pooled)
