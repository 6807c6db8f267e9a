"""Test harness: run everything on CPU with 8 virtual devices.

This is the standard JAX pattern for exercising pjit/Mesh code without TPU hardware
(SURVEY.md §4d): the same shardings compile to real collectives on a v5e-8 slice.
Must run before jax initializes its backends, hence env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image pre-imports jax with JAX_PLATFORMS=axon (real TPU tunnel); tests must
# run on the virtual 8-device CPU backend, so override the latched config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Smoke tier (VERDICT r4 #4): `pytest -m smoke` is the documented pre-commit
# gate — one or two fast representatives per subsystem, kept under 10 min on
# this 1-core box (the full suite is ~40 min, which is how round 4 shipped a
# late-change regression: the tail never got re-run).  Curated HERE, not with
# scattered decorators, so the tier is auditable at a glance.
SMOKE_TESTS = {
    # metrics + config/CLI
    "test_metrics.py::test_weighted_f1_matches_sklearn",
    "test_metrics.py::test_macro_f1_matches_sklearn",
    "test_cli_config.py::test_defaults_match_reference_flags",
    "test_cli_config.py::test_flag_overrides_flow_through",
    # core ops
    "test_gumbel.py::test_deterministic_mode_is_tempered_softmax",
    "test_frame_filter.py::test_filter_matches_reference_bs1",
    "test_span_extract.py::test_span_extract_matches_reference_loop",
    "test_encoder.py::test_encoder_matches_numpy",
    "test_layers.py::test_layernorm_tf_matches_manual",
    "test_crossmodal.py::test_crossmodal_matches_numpy",
    # pallas kernels (one fwd + one bwd representative)
    "test_pallas.py::test_fused_attention_matches_reference",
    "test_pallas.py::test_fused_attention_block_pallas_bwd_grads_match",
    # models
    "test_models.py::test_multimodal_forward_tav",
    "test_models.py::test_fused_pipeline_end_to_end",
    # data
    "test_data.py::test_truncate_matches_reference",
    "test_data.py::test_meld_multimodal_batch_assembly",
    # training
    "test_train.py::test_multimodal_step_two_optimizer_coupling",
    "test_train.py::test_unimodal_training_descends",
    # persistence/resume + preemption
    "test_resume.py::test_unimodal_resume_from_epoch_checkpoint",
    "test_resume.py::test_preemption_saves_checkpoint_and_resumes",
    # mesh/sharding (one execution test + the production-dim audit)
    "test_parallel.py::test_dp_training_step_on_mesh",
    "test_sharding_audit.py::test_param_shardings_divide_production_dims",
    "test_sharding_audit.py::test_zero1_shardings_divide_production_dims",
    # serving
    "test_serve_http.py::test_predict_matches_direct_path",
    # appendix (M3ED)
    "test_appendix.py::test_m3ed_text_prep_parity",
}


def _smoke_key(item):
    """'tests/test_x.py::test_y[some/param]' -> ('test_x.py', 'test_x.py::test_y').

    Split on '::' FIRST: '/' may legitimately appear inside a parametrize id,
    so only the path component (before the first '::') is basename'd."""
    path, sep, rest = item.nodeid.partition("::")
    fname = path.rsplit("/", 1)[-1]
    return fname, f"{fname}::{rest.split('[')[0]}"


def pytest_collection_modifyitems(config, items):
    matched = set()
    collected_files = set()
    for item in items:
        fname, key = _smoke_key(item)
        collected_files.add(fname)
        if key in SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
            matched.add(key)
    # rename guard: whenever every file the tier draws from was collected
    # (i.e. not a single-file run), a SMOKE_TESTS entry that matched nothing
    # means a test was renamed/removed and the tier silently shrank
    smoke_files = {n.split("::")[0] for n in SMOKE_TESTS}
    if smoke_files <= collected_files:
        missing = SMOKE_TESTS - matched
        assert not missing, (
            f"SMOKE_TESTS entries match no collected test (renamed?): "
            f"{sorted(missing)}")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
