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


@pytest.fixture(scope="session")
def coco_dir(tmp_path_factory):
    """Synthetic COCO-layout dataset: 10 images + label txts + list file."""
    import cv2

    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    lbl_dir = root / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(42)
    paths = []
    for i in range(10):
        h, w = int(rng.integers(80, 160)), int(rng.integers(80, 160))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = img_dir / f"img_{i:04d}.jpg"
        cv2.imwrite(str(p), img)
        n = int(rng.integers(1, 4))
        rows = np.zeros((n, 5), np.float32)
        rows[:, 0] = rng.integers(0, 3, n)
        rows[:, 1:3] = rng.uniform(0.3, 0.7, (n, 2))
        rows[:, 3:5] = rng.uniform(0.1, 0.3, (n, 2))
        np.savetxt(str(lbl_dir / f"img_{i:04d}.txt"), rows, fmt="%.6f")
        paths.append(str(p))
    list_file = root / "train.txt"
    list_file.write_text("\n".join(paths) + "\n")
    return str(list_file)
