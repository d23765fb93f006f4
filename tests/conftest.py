"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled
(f64 scoring = exact reference math; TPU production path uses two-float)."""

import os
import sys

# the axon sitecustomize imports jax at interpreter start, so env vars are
# too late here — switch platform via the live config instead
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFBUILD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "src")


@pytest.fixture(scope="session")
def ref_real():
    """Path to the compiled reference binary (skip A/B tests if absent)."""
    path = os.path.join(REFBUILD, "real")
    if not os.path.exists(path):
        pytest.skip("reference binary not built (.refbuild/src/real)")
    return path


@pytest.fixture(scope="session")
def ref_print_scores():
    path = os.path.join(REFBUILD, "printScores")
    if not os.path.exists(path):
        pytest.skip("reference printScores not built")
    return path
