"""Device mesh + sharding rules.

The reference has no distributed story (single GPU, LightningLite 'dp' with
devices=1, reference main.py:152-160).  This module is the TPU-native first-class
replacement (SURVEY.md §5.8): a jax.sharding.Mesh with named axes
('data', 'model'), per-task sharding rules, and helpers for placing host batches.

Layout strategy for this model family on a v5e-8 slice:
  * data parallel over 'data' — batches (utterances / FER images) shard on their
    leading axis; gradients are reduced by XLA-inserted psums over ICI;
  * optional tensor parallel over 'model' for the text tower (the only >100M-param
    component): attention/MLP kernels shard on the feature axis, biases and norms
    replicate; XLA inserts the all-reduces after the row-parallel matmuls.
Params not matched by a rule replicate.  Mesh axes of size 1 make every rule a
no-op, so the same code runs single-chip unchanged.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshPlan:
    mesh: Mesh
    data_axis: str = "data"
    model_axis: str = "model"


def build_mesh(dp: int = -1, tp: int = 1, *, data_axis: str = "data",
               model_axis: str = "model",
               devices: Optional[list] = None) -> MeshPlan:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != device count ({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return MeshPlan(Mesh(arr, (data_axis, model_axis)), data_axis, model_axis)


def replicate(plan: MeshPlan) -> NamedSharding:
    return NamedSharding(plan.mesh, P())


def batch_sharding(plan: MeshPlan) -> NamedSharding:
    """Leading-axis data-parallel sharding."""
    return NamedSharding(plan.mesh, P(plan.data_axis))


def shard_batch(plan: MeshPlan, batch: Any, axis: int = 0) -> Any:
    """Place a host batch pytree onto the mesh, data-sharded on `axis`
    (axis=1 for the microbatch layout: (M, per-micro-batch, ...))."""
    if axis == 0:
        sh = batch_sharding(plan)
    else:
        spec = [None] * axis + [plan.data_axis]
        sh = NamedSharding(plan.mesh, P(*spec))

    def place(x):
        return jax.device_put(x, sh)

    return jax.tree.map(place, batch)


# Tensor-parallel rules for the text tower: (regex on 'path/with/slashes', spec).
# Column-parallel (shard output features) for qkv/up-projections, row-parallel
# (shard input features) for the down-projections; XLA inserts the psum.
_TP_RULES = [
    (r".*text_encoder/layer_\d+/(query|key|value)/kernel$", P(None, "model")),
    (r".*text_encoder/layer_\d+/(query|key|value)/bias$", P("model")),
    (r".*text_encoder/layer_\d+/attn_out/kernel$", P("model", None)),
    (r".*text_encoder/layer_\d+/intermediate/kernel$", P(None, "model")),
    (r".*text_encoder/layer_\d+/intermediate/bias$", P("model")),
    (r".*text_encoder/layer_\d+/output/kernel$", P("model", None)),
    (r".*word_embeddings/embedding$", P(None, None)),
    # fusion self-attn encoder towers (audio/vision/unimodal — ops/encoder.py):
    # same Megatron column/row pattern; heads split across 'model' (heads %
    # tp == 0 or the divisibility guard below replicates the leaf)
    (r".*utt_transformer/layer_\d+/selfatt/(query|key|value)/kernel$",
     P(None, "model")),
    (r".*utt_transformer/layer_\d+/selfatt/(query|key|value)/bias$",
     P("model")),
    (r".*utt_transformer/layer_\d+/attn_dense/kernel$", P("model", None)),
    (r".*utt_transformer/layer_\d+/intermediate/kernel$", P(None, "model")),
    (r".*utt_transformer/layer_\d+/intermediate/bias$", P("model")),
    (r".*utt_transformer/layer_\d+/output/kernel$", P("model", None)),
    # crossmodal MulT stacks (ops/crossmodal.py): the packed (E, 3E) in_proj
    # column-shards on its output axis (GSPMD keeps the q/k/v row-slice
    # semantics; sharding is layout, never math), out_proj/fc2 row-parallel
    (r".*CrossModalTrans_\w+/layer_\d+/self_attn/in_proj_kernel$",
     P(None, "model")),
    (r".*CrossModalTrans_\w+/layer_\d+/self_attn/in_proj_bias$", P("model")),
    (r".*CrossModalTrans_\w+/layer_\d+/self_attn/out_proj/kernel$",
     P("model", None)),
    (r".*CrossModalTrans_\w+/layer_\d+/fc1/kernel$", P(None, "model")),
    (r".*CrossModalTrans_\w+/layer_\d+/fc1/bias$", P("model")),
    (r".*CrossModalTrans_\w+/layer_\d+/fc2/kernel$", P("model", None)),
]


def _spec_for(path: str, shape) -> P:
    for pattern, spec in _TP_RULES:
        if re.match(pattern, path):
            return spec
    return P()


def opt_state_shardings(plan: MeshPlan, opt_state: Any,
                        min_size: int = 65536) -> Any:
    """ZeRO-1-style sharding tree for an optimizer-state pytree.

    Every moment leaf of at least `min_size` elements shards over the 'data'
    axis on its first dp-divisible dimension; counts/scalars and small leaves
    replicate.  This is VALUE-EXACT, not an approximation: AdamW's moment
    update is elementwise, so GSPMD slices the (dp-replicated, psum-reduced)
    gradients into each device's moment shard, each device updates 1/dp of
    the moments, and the parameter-update delta is all-gathered back to the
    replicated params — the classic ZeRO-1 dataflow expressed purely through
    sharding annotations, with XLA inserting the collectives
    (scaling-book recipe; the reference has no distributed story at all,
    reference main.py:152-160).  Memory: AdamW moments drop from 2x params
    to 2x params / dp per device.

    With tp > 1, moments of TP-sharded params still shard over 'data' here;
    GSPMD reshards the TP-sharded grads into the moment layout (an extra
    ICI transfer for those leaves — acceptable at this model's text-tower
    sizes, and tp=1 fleets pay nothing).
    """
    dp = plan.mesh.shape[plan.data_axis]

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        size = int(np.prod(shape)) if shape else 1
        if dp <= 1 or size < min_size:
            return NamedSharding(plan.mesh, P())
        for ax, dim in enumerate(shape):
            if dim % dp == 0 and dim >= dp:
                spec = [None] * len(shape)
                spec[ax] = plan.data_axis
                return NamedSharding(plan.mesh, P(*spec))
        return NamedSharding(plan.mesh, P())

    return jax.tree.map(spec_for, opt_state)


def param_shardings(plan: MeshPlan, params: Any) -> Any:
    """NamedSharding tree for a parameter pytree: TP rules on the text tower,
    replication elsewhere.  With tp=1 everything degenerates to replicated."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "name"):
                parts.append(str(k.name))
            else:
                parts.append(str(k))
        return "/".join(parts)

    tp_size = plan.mesh.shape[plan.model_axis]
    shardings = {}
    for kp, leaf in flat:
        p = path_str(kp)
        spec = _spec_for(p, leaf.shape) if tp_size > 1 else P()
        # drop specs that don't divide evenly (tiny test configs)
        if tp_size > 1 and any(
                s is not None and leaf.shape[i] % tp_size != 0
                for i, s in enumerate(spec)):
            spec = P()
        shardings[p] = NamedSharding(plan.mesh, spec)

    def lookup(kp, leaf):
        return shardings[path_str(kp)]

    return jax.tree_util.tree_map_with_path(lookup, params)
