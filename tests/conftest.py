"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set the XLA flags BEFORE jax is imported anywhere. The real-TPU bench
path is exercised by bench.py, not by the unit tests.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Drop the environment's TPU-relay plugin ('axon') from the import path
# BEFORE jax loads: the plugin phones the relay backend at import time and
# can hang even pure-CPU test runs (TPU_NOTES relay rule 4 — now enforced
# here instead of living in the operator's head).
_AXON = "/root/.axon_site"
sys.path[:] = [p for p in sys.path if _AXON not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and _AXON not in p
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# The environment's TPU plugin ('axon') force-registers itself and overrides
# JAX_PLATFORMS from the environment — the config update below is the only
# reliable way to pin unit tests to the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
