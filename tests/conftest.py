# conftest.py — CPU test harness with a virtual 8-device mesh.
#
# Tests run on CPU with xla_force_host_platform_device_count=8 (the standard
# JAX fake backend for exercising pjit/mesh code without TPUs — SURVEY.md §4
# test-strategy item 4). Synthetic data is shrunk so 3D convs compile fast.
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("SPCCT_SYNTH_HW", "32")
os.environ.setdefault("SPCCT_SYNTH_SLICES", "4")
os.environ.setdefault("SPCCT_COMPUTE_DTYPE", "float32")

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS; the config API
# takes precedence, forcing the virtual 8-device CPU backend for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
