"""Fused end-to-end FacialMMT program.

The reference splits the T+A+V forward across the trainer and two models with a
host round-trip in between: Swin over the batch's faces, a Python frame-filter on
host scalars, then the multimodal model (reference train.py:60-133 + src/models.py).
Here the whole thing is ONE jitted program — Swin FER, gumbel-softmax, scatter to
per-utterance layout, frame-importance filter, and the fusion model — so XLA
schedules it end-to-end on device with zero host syncs per step.

Face packing: the host loader packs every real face of the batch contiguously into
a static-capacity buffer `faces (N, H, W, 3)` with `face_utt_id`/`face_pos` slot
maps (-1 = pad slot).  Swin therefore burns zero FLOPs on padding, and capacity N
buckets keep shapes static across steps.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from facialmmt_tpu.config import FacialMMTConfig
from facialmmt_tpu.models.multimodal import MultiModalTransformerForClassification
from facialmmt_tpu.models.swin_fer import SwinForAffwildClassification
from facialmmt_tpu.ops.frame_filter import (frame_importance_filter,
                                            scatter_face_probs)

Dtype = Any


class FacialMMTPipeline(nn.Module):
    """Shared-Swin multi-task composition.

    Methods:
      * __call__(batch)       -> target-task logits (B, num_labels)
      * aux_logits(images)    -> auxiliary FER logits (N, num_labels)

    Parameter tree has two top-level branches ('swin_model', 'multimodal') so the
    trainer can keep the reference's two-optimizer coupling: Swin is stepped only
    by the aux loss; target-task gradients into Swin are computed and then
    discarded (reference train.py:305-340 + SURVEY.md §3.2 — surfaced as an
    explicit config choice in the trainer).
    """

    config: FacialMMTConfig
    dtype: Optional[Dtype] = None

    def setup(self):
        self.swin_model = SwinForAffwildClassification(
            self.config, dtype=self.dtype, name="swin_model")
        self.multimodal = MultiModalTransformerForClassification(
            self.config, dtype=self.dtype, name="multimodal")

    def __call__(self, batch, *, deterministic: bool = True,
                 stop_swin_gradient: bool = False):
        """stop_swin_gradient=True cuts the backward pass at the FER-distribution
        boundary.  The reference COMPUTES target-task gradients into Swin and
        then discards them (two-optimizer coupling, reference train.py:305-340),
        so stopping the gradient is numerically identical for the applied
        updates while skipping the entire Swin backward — the dominant cost of
        a training step.  Joint training (swin_from_target) keeps it False."""
        cfg = self.config
        b = batch["vision_feats"].shape[0]
        f = cfg.data.vision_utt_max_len

        # frame-level FER distributions for every real face in the batch.
        # Only JOINT TRAINING (grads into Swin: training mode without the
        # stop-grad) demotes 'auto' to lane-slice attention — see aux_logits
        # note; eval and the stop-grad training path (the default) keep the
        # faster grad-free pair kernel.  A precomputed 'face_probs' entry
        # (the chunked large-batch eval path, train/steps.py) skips the
        # in-program Swin entirely.
        probs_flat = batch.get("face_probs")
        if probs_flat is None:
            # joint training (grads into Swin): 'auto_grad' keeps the fused
            # kernels with their flash-style Pallas backwards — resident
            # weight-grad accumulators at stages 0-2, the spill variant at
            # stage 3 — and lane-slice XLA autodiff elsewhere
            impl = ("auto_grad" if (not deterministic
                                    and not stop_swin_gradient
                                    and cfg.swin.attention_impl == "auto")
                    else None)
            probs_flat = self.swin_model(
                batch["faces"], is_trg_task=True, deterministic=deterministic,
                attention_impl=impl)
            if stop_swin_gradient:
                probs_flat = jax.lax.stop_gradient(probs_flat)
        probs = scatter_face_probs(
            probs_flat.astype(jnp.float32), batch["face_utt_id"],
            batch["face_pos"], b, f)

        face_mask = (jnp.arange(f)[None, :] < batch["n_faces"][:, None])
        vision_concat, new_vision_mask = frame_importance_filter(
            batch["vision_feats"], probs, face_mask,
            cfg.facial_emo_impor_threshold)

        return self.multimodal(
            batch["dia_input_ids"], batch["dia_input_mask"],
            batch["dia_sep_mask"],
            audio_inputs=batch.get("audio_inputs"),
            audio_mask=batch.get("audio_mask"),
            vision_inputs=vision_concat.astype(
                batch["vision_feats"].dtype),
            vision_mask=new_vision_mask,
            utt_in_dia_idx=batch["utt_in_dia_idx"],
            dia_idx=batch.get("dia_idx"),
            deterministic=deterministic)

    def fer_probs(self, faces, *, deterministic: bool = True):
        """Frame-level FER distributions for one packed-face tile.  The
        chunked eval path (train/steps.py face_chunk) lax.map's this over
        face tiles so a 2048-face batch never needs all Swin activations
        resident at once; grad-free, so 'auto' keeps the pair kernel."""
        return self.swin_model(faces, is_trg_task=True,
                               deterministic=deterministic)

    def aux_logits(self, images, *, deterministic: bool = True):
        # under 'auto', grad-bearing training ('not deterministic': the aux
        # loss backprops through Swin) resolves to 'auto_grad' — the fused
        # attention kernels with Pallas backwards at every stage (resident
        # accumulators 0-2, spill at 3), the fused MLP kernel at stages 0-2;
        # aux EVAL is grad-free and keeps the plain 'auto' eval kernels
        impl = ("auto_grad" if (not deterministic
                                and self.config.swin.attention_impl == "auto")
                else None)
        return self.swin_model(images, is_trg_task=False,
                               deterministic=deterministic,
                               attention_impl=impl)
