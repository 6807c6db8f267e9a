"""Swin FER model: shared backbone + emotion head (reference src/models.py:14-37).

Head: Linear(512->64) -> ReLU -> Linear(64->num_labels); in target-task mode the
logits pass through gumbel-softmax(tau) to emit a soft per-frame emotion
distribution (reference src/models.py:31-32).
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from facialmmt_tpu.config import FacialMMTConfig
from facialmmt_tpu.ops.gumbel import gumbel_softmax
from facialmmt_tpu.ops.layers import TorchLinear
from facialmmt_tpu.ops.swin import SwinTransformer

Dtype = Any


class SwinForAffwildClassification(nn.Module):
    config: FacialMMTConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, images, *, is_trg_task: bool = False,
                 deterministic: bool = True, gumbel_rng=None,
                 attention_impl=None):
        """images: (N, H, W, 3) normalized, channel-last.

        Returns logits (N, num_labels); in trg-task mode, the gumbel-softmax
        distribution instead.  Loss (cross-entropy) lives in the train step.
        attention_impl: per-call backbone kernel override (see
        ops/swin.py::SwinTransformer).
        """
        cfg = self.config
        x = SwinTransformer(cfg.swin, dtype=self.dtype, name="swin")(
            images, deterministic=deterministic,
            attention_impl=attention_impl)
        x = TorchLinear(64, dtype=self.dtype, name="linear")(x)
        x = nn.relu(x)
        logits = TorchLinear(cfg.num_labels, dtype=self.dtype, name="classifier")(x)
        if is_trg_task:
            if gumbel_rng is None and not cfg.runtime.deterministic_gumbel:
                gumbel_rng = self.make_rng("gumbel")
            return gumbel_softmax(gumbel_rng, logits, cfg.tau,
                                  deterministic=cfg.runtime.deterministic_gumbel)
        return logits
