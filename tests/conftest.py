"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends.  This is the
"fake TPU" backend for testing sharding/collectives without real chips
(SURVEY.md §4).
"""

import os

# NOTE: this environment's sitecustomize registers the TPU ("axon") backend at
# interpreter start and force-updates jax's platform config — a plain
# JAX_PLATFORMS=cpu env var is ignored by the time conftest runs.  We must
# override via jax.config below, before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism and speed for tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu" and len(devs) == 8, (
        f"tests must run on the 8-device virtual CPU mesh, got {devs}"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
