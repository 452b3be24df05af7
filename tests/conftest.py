"""Test configuration: force CPU backend with 8 virtual devices.

Mirrors the multi-chip test strategy in SURVEY.md §4: all sharding tests run on a
virtual 8-device CPU mesh so they are hardware independent; the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""
import os

# Must run before jax is imported anywhere. The host environment may pre-set
# JAX_PLATFORMS (e.g. to the axon TPU plugin), so assign unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
