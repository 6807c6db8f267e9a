"""Production-dim sharding audit (VERDICT r4 missing #3).

dryrun_multichip and the rest of test_parallel.py exercise the mesh plans at
`FacialMMTConfig.tiny()` dims; the sharding layout that would actually run on
a v5e-8 — roberta-large text tower TP, ZeRO-1 moments at production sizes —
had never been through a compiler.  These tests close that gap at CPU cost:

  * abstract param/opt-state shapes via jax.eval_shape (no FLOPs, no memory),
  * every NamedSharding spec asserted to DIVIDE its axis for
    dp x tp in {(8,1), (4,2), (2,4)},
  * the TP rules asserted to actually FIRE at production dims (the
    divisibility guard in param_shardings silently replicates non-dividing
    leaves — at tiny dims that's routine; at production dims it would mean
    the TP plan is a no-op),
  * `jit(train_step).lower()` on abstract production-shape args — full trace
    + StableHLO lowering with the shardings attached, no backend compile.

The reference has no distributed story (single GPU, reference
main.py:152-160); the bar here is parallel/mesh.py's own rules vs SURVEY §5.8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facialmmt_tpu.config import FacialMMTConfig, OptimConfig
from facialmmt_tpu.parallel.mesh import (build_mesh, opt_state_shardings,
                                         param_shardings)

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")

MESH_LAYOUTS = [(8, 1), (4, 2), (2, 4)]


@pytest.fixture(scope="module")
def abstract_state():
    """Abstract production-dim params + opt states: eval_shape of the real
    init/tx.init — ShapeDtypeStructs only, nothing materializes."""
    from __graft_entry__ import _make_batch

    from facialmmt_tpu.models.pipeline import FacialMMTPipeline
    from facialmmt_tpu.train.optim import make_optimizer

    cfg = FacialMMTConfig()
    model = FacialMMTPipeline(cfg, dtype=jnp.bfloat16)
    # geometry: every leading axis (8 utts, 4 unique dialogues, 16 faces)
    # divides the largest dp in MESH_LAYOUTS — the same invariant the real
    # loader enforces when a mesh plan is active
    batch = _make_batch(cfg, b=8, utts_per_dia=2, faces_per_utt=2)
    variables = jax.eval_shape(
        model.init,
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)
    opt_cfg = OptimConfig(warm_up=0.0)
    swin_tx = make_optimizer(opt_cfg, opt_cfg.aux_lr, 1000)
    mm_tx = make_optimizer(opt_cfg, opt_cfg.trg_lr, 1000,
                           opt_cfg.weight_decay)
    swin_opt = jax.eval_shape(swin_tx.init, variables["params"]["swin_model"])
    mm_opt = jax.eval_shape(mm_tx.init, variables["params"]["multimodal"])
    return cfg, model, batch, variables, (swin_tx, mm_tx), (swin_opt, mm_opt)


def _leaf_paths_with_specs(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [("/".join(str(getattr(k, "key", getattr(k, "name", k)))
                      for k in kp), s) for kp, s in flat]


def _assert_spec_divides(path, shape, spec, mesh):
    for ax_idx, names in enumerate(spec):
        if names is None:
            continue
        names = names if isinstance(names, tuple) else (names,)
        size = int(np.prod([mesh.shape[n] for n in names]))
        assert ax_idx < len(shape), (
            f"{path}: spec {spec} names axis {ax_idx} beyond shape {shape}")
        assert shape[ax_idx] % size == 0, (
            f"{path}: axis {ax_idx} of {shape} not divisible by "
            f"mesh extent {size} ({spec})")


@pytest.mark.parametrize("dp,tp", MESH_LAYOUTS)
def test_param_shardings_divide_production_dims(abstract_state, dp, tp):
    cfg, model, batch, variables, _, _ = abstract_state
    plan = build_mesh(dp=dp, tp=tp)
    shardings = param_shardings(plan, variables["params"])
    params_flat = dict(_leaf_paths_with_specs(variables["params"]))
    n_tp_sharded = 0
    for path, sh in _leaf_paths_with_specs(shardings):
        _assert_spec_divides(path, params_flat[path].shape, sh.spec,
                             plan.mesh)
        if any(ax is not None for ax in sh.spec):
            n_tp_sharded += 1
    if tp > 1:
        # the TP rules must actually fire at production dims: every
        # text-tower layer contributes >= 6 sharded leaves, the fusion
        # towers and crossmodal stacks more — the divisibility guard
        # silently replacing them with P() would make TP a silent no-op
        min_expected = 6 * cfg.text.num_layers
        assert n_tp_sharded >= min_expected, (
            f"only {n_tp_sharded} leaves TP-sharded at tp={tp} "
            f"(expected >= {min_expected}) — rules are being dropped")
    else:
        assert n_tp_sharded == 0


@pytest.mark.parametrize("dp,tp", MESH_LAYOUTS)
def test_zero1_shardings_divide_production_dims(abstract_state, dp, tp):
    _, _, _, _, _, (swin_opt, mm_opt) = abstract_state
    plan = build_mesh(dp=dp, tp=tp)
    for name, opt in (("swin", swin_opt), ("mm", mm_opt)):
        shardings = opt_state_shardings(plan, opt)
        leaves = dict(_leaf_paths_with_specs(opt))
        n_sharded = 0
        for path, sh in _leaf_paths_with_specs(shardings):
            _assert_spec_divides(path, getattr(leaves[path], "shape", ()),
                                 sh.spec, plan.mesh)
            if any(ax is not None for ax in sh.spec):
                n_sharded += 1
        # production-size moments (roberta-large kernels are 1024x1024+)
        # must clear the 65536 default threshold and dp-divide
        assert n_sharded > 0, (
            f"{name} opt state: no moment leaf ZeRO-1-sharded at "
            f"production dims")


@pytest.mark.parametrize("dp,tp", [(4, 2)])
def test_train_step_lowers_at_production_dims(abstract_state, dp, tp):
    """Trace + lower (NO backend compile) the full multimodal train step at
    production dims with the real sharding plan attached: catches spec/shape
    mismatches, in_shardings inconsistencies, and partitioning errors that
    only GSPMD propagation would surface — at CPU trace cost."""
    from facialmmt_tpu.train.optim import MultiTaskState
    from facialmmt_tpu.train.steps import make_multimodal_train_step

    cfg, model, batch, variables, (swin_tx, mm_tx), (swin_opt, mm_opt) = (
        abstract_state)
    plan = build_mesh(dp=dp, tp=tp)

    p_sh = param_shardings(plan, variables["params"])
    rep = jax.sharding.NamedSharding(plan.mesh, jax.sharding.PartitionSpec())
    data_sh = jax.sharding.NamedSharding(
        plan.mesh, jax.sharding.PartitionSpec("data"))

    step_abs = jax.ShapeDtypeStruct((), jnp.int32)
    state_abs = MultiTaskState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        swin_opt_state=swin_opt, mm_opt_state=mm_opt,
        swin_step=step_abs, mm_step=step_abs)
    state_sh = MultiTaskState(
        params=p_sh,
        batch_stats=jax.tree.map(lambda _: rep, variables["batch_stats"]),
        swin_opt_state=opt_state_shardings(plan, swin_opt),
        mm_opt_state=opt_state_shardings(plan, mm_opt),
        swin_step=rep, mm_step=rep)
    batch_abs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch)
    batch_sh = jax.tree.map(lambda _: data_sh, batch)
    key_abs = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    step = make_multimodal_train_step(model, swin_tx, mm_tx)
    lowered = jax.jit(
        step, in_shardings=(state_sh, batch_sh, rep)).lower(
            state_abs, batch_abs, key_abs)
    hlo = lowered.as_text()
    assert "sharding" in hlo  # the annotations actually reached the HLO
