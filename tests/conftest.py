"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere: multi-device sharding paths are
exercised on virtual CPU devices (SURVEY.md §4(d)), keeping the single real
TPU chip free for benchmarks.
"""

import os

# Hard-set (not setdefault): the ambient environment exports
# JAX_PLATFORMS=axon (the real TPU tunnel); tests must run on virtual CPU
# devices so the chip stays free and multi-device paths are exercised.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# This box has a single physical core; 8 virtual devices time-share it, so
# XLA's default 40s collective-rendezvous termination timeout can fire on
# slow steps.  Raise it.
if "collective" not in _flags:
    _flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=600"
               " --xla_cpu_collective_timeout_seconds=600")
os.environ["XLA_FLAGS"] = _flags.strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# A pytest plugin may import jax BEFORE this conftest runs, freezing the
# ambient JAX_PLATFORMS=axon into jax's config defaults.  Backends are still
# uninitialized at conftest time, so force the platform programmatically too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    n = len(jax.devices())
    assert n == 8, (
        f"tests must run on 8 virtual CPU devices, got {jax.devices()} — "
        "the TPU tunnel must stay free and sharding paths exercised")


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
