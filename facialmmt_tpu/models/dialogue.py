"""Dialogue-level multimodal model (appendix A4, reference
(Appendix)CCAC2023/src/models.py:228-385).

One sample = one whole dialogue: audio/vision come as (B, D, L, feat) —
dialogue axis D, per-utterance frame axis L — and crossmodal fusion runs across
the DIALOGUE axis (utterances attend to each other), unlike the utterance-level
model where fusion runs across frames within one utterance.

Reference semantics preserved:
  * audio/vision: reshape to (B*D, L, feat) -> linear -> post-LN encoder ->
    additive pool -> (B, D, H);
  * text: dialogue token encoding; the feature at each utterance-final sep
    token becomes that utterance's vector (masked_select + repack by
    curr_numUtt_in_dia, reference :318-329) — here a closed-form cumsum scatter;
  * crossmodal fuse: shared TA encoder both directions, concat on the FEATURE
    axis -> multimodal_linear2 (2H->H); then shared TA_V with vision both ways,
    concat feature axis -> the SAME multimodal_linear2 -> per-utterance logits;
  * concat fuse: per-stream pooled vectors -> concat -> multimodal_linear.

Static-shape deviation: the reference emits (num_valid_utt, 7) via
masked_select; here logits are (B, D, num_labels) with dia_mask — consumers
flatten with the mask (an XLA-friendly equivalent)."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from facialmmt_tpu.config import FacialMMTConfig, resolve_text_config
from facialmmt_tpu.models.text_encoder import TextEncoder
from facialmmt_tpu.ops.crossmodal import CrossModalTransformerEncoder
from facialmmt_tpu.ops.encoder import UttTransEncoder
from facialmmt_tpu.ops.layers import AdditiveAttention, TorchLinear

Dtype = Any


def scatter_sep_features(text_feats: jnp.ndarray, sep_mask: jnp.ndarray,
                         max_dia_len: int) -> jnp.ndarray:
    """(B, L, H) dialogue features + sep mask -> (B, max_dia_len, H) where slot
    u holds the feature at the u-th sep position (reference masked_select +
    repack, (Appendix)CCAC2023/src/models.py:323-329)."""
    sep = sep_mask.astype(jnp.int32)
    slot = jnp.cumsum(sep, axis=1) - 1                     # 0-based utt index
    valid = (sep == 1) & (slot < max_dia_len)
    safe_slot = jnp.where(valid, slot, 0)
    b = text_feats.shape[0]
    out = jnp.zeros((b, max_dia_len, text_feats.shape[-1]), text_feats.dtype)
    contrib = text_feats * valid[:, :, None].astype(text_feats.dtype)
    batch_idx = jnp.arange(b)[:, None] * jnp.ones_like(safe_slot)
    return out.at[batch_idx, safe_slot].add(contrib)


class DialogueMultiModalTransformer(nn.Module):
    config: FacialMMTConfig
    dtype: Optional[Dtype] = None

    def _crossmodal(self, cm_cfg, name):
        return CrossModalTransformerEncoder(
            embed_dim=self.config.hidden_size, num_heads=cm_cfg.num_heads,
            layers=cm_cfg.layers, attn_dropout=cm_cfg.attn_dropout,
            gelu_dropout=cm_cfg.gelu_dropout, res_dropout=cm_cfg.res_dropout,
            embed_dropout=cm_cfg.embed_dropout, attn_mask=cm_cfg.attn_mask,
            fused_attention=cm_cfg.fused_attention,
            max_positions=256, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, dia_input_ids, dia_input_mask, dia_sep_mask,
                 audio_inputs, audio_mask, vision_inputs, vision_mask,
                 dia_mask, *, deterministic: bool = True):
        """audio_inputs: (B, D, La, da); vision_inputs: (B, D, Lv, dv);
        audio_mask/vision_mask: (B, D, L*); dia_mask: (B, D).
        Returns logits (B, D, num_labels)."""
        cfg = self.config
        h = cfg.hidden_size
        b, d_max = dia_mask.shape
        pool = AdditiveAttention(h, h, dtype=self.dtype,
                                 name="attention_pooling")

        def utt_stream(x, mask, linear_name, enc_name, layers, max_len):
            _, _, l, feat = x.shape
            xf = x.reshape(b * d_max, l, feat)
            mf = mask.reshape(b * d_max, l)
            y = TorchLinear(h, dtype=self.dtype, name=linear_name)(xf)
            y = UttTransEncoder(cfg.encoder, layers, max_len, dtype=self.dtype,
                                name=enc_name)(y, mf,
                                               deterministic=deterministic)
            pooled, _ = pool(y, mf)
            return pooled.reshape(b, d_max, h)

        audio_utt = utt_stream(audio_inputs, audio_mask, "audio_linear",
                               "audio_utt_transformer",
                               cfg.audio_utt_transformer_num,
                               cfg.data.audio_utt_max_len)
        vision_utt = utt_stream(vision_inputs, vision_mask, "vision_linear",
                                "vision_utt_transformer",
                                cfg.vision_utt_transformer_num,
                                cfg.data.vision_utt_max_len)

        text_cfg = resolve_text_config(cfg)
        enc_out = TextEncoder(text_cfg, dtype=self.dtype, name="text_encoder")(
            dia_input_ids, dia_input_mask, deterministic=deterministic)
        text_lin = TorchLinear(h, dtype=self.dtype, name="text_linear")(enc_out)
        text_utt = scatter_sep_features(text_lin, dia_sep_mask, d_max)

        if cfg.modality_fuse == "crossmodal":
            linear2 = TorchLinear(h, dtype=self.dtype,
                                  name="multimodal_linear2")
            cm_ta = self._crossmodal(cfg.crossmodal_ta, "CrossModalTrans_TA")
            t_x_a = cm_ta(text_utt, audio_utt, audio_utt,
                          deterministic=deterministic)
            a_x_t = cm_ta(audio_utt, text_utt, text_utt,
                          deterministic=deterministic)
            ta = linear2(jnp.concatenate([t_x_a, a_x_t], axis=-1))
            cm_tav = self._crossmodal(cfg.crossmodal_ta_v,
                                      "CrossModalTrans_TA_V")
            v_x_ta = cm_tav(vision_utt, ta, ta, deterministic=deterministic)
            ta_x_v = cm_tav(ta, vision_utt, vision_utt,
                            deterministic=deterministic)
            fused = linear2(jnp.concatenate([ta_x_v, v_x_ta], axis=-1))
        else:  # concat
            fused = TorchLinear(h, dtype=self.dtype, name="multimodal_linear")(
                jnp.concatenate([text_utt, audio_utt, vision_utt], axis=-1))

        fused = nn.Dropout(cfg.encoder.hidden_dropout_prob)(
            fused, deterministic=deterministic)
        logits = TorchLinear(cfg.num_labels, dtype=self.dtype,
                             name="classifier")(fused)
        return logits
