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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
