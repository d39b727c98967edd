"""Native (C++) contour library parity vs the Python implementations."""

import numpy as np
import pytest

from microbeseg_tpu.client import native
from tests.conftest import synthetic_blobs


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def _py_trace(mask):
    """Force the Python tracer by bypassing the native fast path."""
    import microbeseg_tpu.client.contours as c
    import microbeseg_tpu.client.native as n
    orig = n.trace_boundary_native
    n.trace_boundary_native = lambda *a, **k: None
    try:
        return c.trace_boundary(mask)
    finally:
        n.trace_boundary_native = orig


def _py_raster(poly, shape):
    import microbeseg_tpu.client.contours as c
    import microbeseg_tpu.client.native as n
    orig = n.rasterize_polygon_native
    n.rasterize_polygon_native = lambda *a, **k: None
    try:
        return c.polygon_to_mask(poly, shape)
    finally:
        n.rasterize_polygon_native = orig


class TestNativeParity:
    def test_trace_parity(self, lib, rng):
        for _ in range(5):
            blobs = synthetic_blobs(rng, shape=(48, 48), n_blobs=4)
            for inst_id in np.unique(blobs[blobs > 0]):
                m = blobs == inst_id
                py = _py_trace(m)
                cc = native.trace_boundary_native(m.astype(np.int32), 1)
                np.testing.assert_array_equal(cc, py)

    def test_trace_shapes(self, lib):
        # single pixel, line, L-shape
        for m in [np.eye(1, 5, 2, dtype=bool).reshape(1, 5),
                  np.pad(np.ones((1, 6), bool), ((2, 2), (1, 1)))]:
            py = _py_trace(m)
            cc = native.trace_boundary_native(m.astype(np.int32), 1)
            np.testing.assert_array_equal(cc, py)

    def test_raster_parity(self, lib, rng):
        for _ in range(5):
            n = int(rng.integers(3, 10))
            poly = rng.integers(0, 40, (n, 2)).astype(np.float64)
            py = _py_raster(poly, (40, 40))
            cc = native.rasterize_polygon_native(poly, (40, 40))
            np.testing.assert_array_equal(cc, py)

    def test_rasterize_rois_batched(self, lib):
        polys = [np.array([[2.0, 2.0], [10.0, 2.0], [10.0, 10.0], [2.0, 10.0]]),
                 np.array([[20.0, 20.0], [30.0, 20.0], [25.0, 30.0]])]
        out = native.rasterize_rois_native(polys, (40, 40))
        assert out[5, 5] == 1
        assert out[22, 25] == 2
        assert out[0, 0] == 0

    def test_mask_polygon_roundtrip_native(self, lib, rng):
        from microbeseg_tpu.client.contours import mask_to_polygons, polygon_to_mask
        blobs = synthetic_blobs(rng, shape=(64, 64), n_blobs=5)
        polys = mask_to_polygons(blobs)
        recon = np.zeros_like(blobs)
        for inst_id, contours in polys.items():
            for poly in contours:
                recon[polygon_to_mask(poly, blobs.shape)] = inst_id
        agree = (recon > 0) == (blobs > 0)
        assert agree.mean() > 0.97
