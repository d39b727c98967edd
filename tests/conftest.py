"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere: multi-device sharding paths are
exercised on virtual CPU devices (SURVEY.md §4(d)), keeping the single real
TPU chip free for benchmarks.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(seed=1234)


def synthetic_blobs(rng, shape=(96, 96), n_blobs=6, r_range=(5, 12)):
    """Random non-overlapping-ish disks as an instance label image."""
    h, w = shape
    mask = np.zeros(shape, dtype=np.uint16)
    yy, xx = np.mgrid[0:h, 0:w]
    label = 0
    for _ in range(n_blobs):
        r = int(rng.integers(r_range[0], r_range[1]))
        cy = int(rng.integers(r, h - r))
        cx = int(rng.integers(r, w - r))
        disk = (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
        if (mask[disk] > 0).mean() > 0.3:
            continue
        label += 1
        mask[disk & (mask == 0)] = label
    return mask


@pytest.fixture
def blobs(rng):
    return synthetic_blobs(rng)
