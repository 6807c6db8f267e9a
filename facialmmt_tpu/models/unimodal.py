"""Unimodal vision utterance model (reference src/models.py:192-223):
Linear(512->768) -> 2-layer post-LN encoder -> additive-attention pool ->
dropout -> Linear(768->7).  The natural first end-to-end slice (SURVEY.md §7)."""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from facialmmt_tpu.config import FacialMMTConfig
from facialmmt_tpu.ops.encoder import UttTransEncoder
from facialmmt_tpu.ops.layers import AdditiveAttention, TorchLinear

Dtype = Any


class MeldUttTransformer(nn.Module):
    config: FacialMMTConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs, utt_mask, *, deterministic: bool = True):
        """inputs: (B, vision_utt_max_len, vision_feat_dim); utt_mask: (B, L)."""
        cfg = self.config
        x = TorchLinear(cfg.hidden_size, dtype=self.dtype,
                        name="modality_linear")(inputs)
        x = UttTransEncoder(cfg.encoder, cfg.vision_utt_transformer_num,
                            cfg.data.vision_utt_max_len, dtype=self.dtype,
                            name="utt_transformer")(
                                x, utt_mask, deterministic=deterministic)
        pooled, _ = AdditiveAttention(cfg.hidden_size, cfg.hidden_size,
                                      dtype=self.dtype, name="attention")(
                                          x, utt_mask)
        pooled = nn.Dropout(cfg.encoder.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        return TorchLinear(cfg.num_labels, dtype=self.dtype,
                           name="classifier")(pooled)
