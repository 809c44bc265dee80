"""Test config: force an 8-virtual-device CPU platform before JAX import.

Distributed paths (pjit/shard_map over a Mesh) are exercised on a
virtual 8-device CPU mesh, so the full sharding story is testable
without TPU hardware (SURVEY.md §4 test-strategy note).
"""

import os

# Force-override: the environment may pre-set JAX_PLATFORMS (e.g. a TPU
# tunnel platform) and a sitecustomize may import jax before this file
# runs, so set both the env var and the live jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
# Force the device count to exactly 8 — REPLACING any pre-existing
# value (a leftover =2 from another project would fail every mesh test).
import re as _re

_flags = _re.sub(
    r"--xla_force_host_platform_device_count=\d+", "",
    os.environ.get("XLA_FLAGS", ""),
).strip()
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
