"""Device-op tests against scipy/numpy oracles (SURVEY.md §4(a))."""

import numpy as np
import pytest
from scipy import ndimage

from microbeseg_tpu.ops import (
    binary_closing,
    binary_dilation,
    binary_erosion,
    connected_components,
    disk,
    edt,
    gaussian_filter,
    grey_closing,
    regionprops,
    relabel_sequential,
    watershed,
)
from tests.oracles import (
    label_oracle,
    masks_iou,
    partition_equal,
    regionprops_oracle,
    watershed_oracle,
)


class TestGaussian:
    @pytest.mark.parametrize("sigma", [0.5, 1.0, 2.0])
    def test_matches_scipy(self, rng, sigma):
        img = rng.random((41, 57)).astype(np.float32)
        ours = np.asarray(gaussian_filter(img, sigma=sigma))
        ref = ndimage.gaussian_filter(img, sigma=sigma)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_batched(self, rng):
        img = rng.random((3, 32, 32)).astype(np.float32)
        ours = np.asarray(gaussian_filter(img, sigma=0.5))
        for i in range(3):
            np.testing.assert_allclose(
                ours[i], ndimage.gaussian_filter(img[i], 0.5), atol=1e-5)


class TestMorphology:
    @pytest.mark.parametrize("se", [np.ones((3, 3), bool), disk(3)])
    def test_dilation_erosion_closing(self, rng, se):
        x = rng.random((40, 50)) > 0.7
        np.testing.assert_array_equal(
            np.asarray(binary_dilation(x, se)), ndimage.binary_dilation(x, se))
        np.testing.assert_array_equal(
            np.asarray(binary_erosion(x, se)), ndimage.binary_erosion(x, se))
        np.testing.assert_array_equal(
            np.asarray(binary_closing(x, se)), ndimage.binary_closing(x, se))

    def test_grey_closing(self, rng):
        x = rng.random((30, 40)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(grey_closing(x, size=(3, 3))),
            ndimage.grey_closing(x, size=(3, 3)), atol=1e-6)

    def test_disk(self):
        d3 = disk(3)
        assert d3.shape == (7, 7)
        assert d3[3, 3] and d3[0, 3] and not d3[0, 0]


class TestEDT:
    def test_matches_scipy(self, blobs):
        feature = blobs > 0
        ours = np.asarray(edt(feature))
        ref = ndimage.distance_transform_edt(feature)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_valid_mask_emulates_crop(self, blobs):
        feature = blobs > 0
        valid = np.zeros_like(feature)
        valid[10:60, 15:70] = True
        ours = np.asarray(edt(feature, valid))
        ref = np.zeros_like(ours)
        ref[10:60, 15:70] = ndimage.distance_transform_edt(feature[10:60, 15:70])
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_all_feature(self):
        ours = np.asarray(edt(np.ones((8, 8), bool)))
        assert np.all(np.isfinite(ours))

    def test_empty(self):
        ours = np.asarray(edt(np.zeros((8, 8), bool)))
        np.testing.assert_array_equal(ours, 0)


class TestConnectedComponents:
    def test_partition_matches_scipy(self, rng):
        mask = rng.random((48, 64)) > 0.6
        ours = np.asarray(connected_components(mask))
        ref = label_oracle(mask, connectivity=2)
        assert partition_equal(ours, ref)

    def test_4_connectivity(self):
        mask = np.array([[1, 0], [0, 1]], dtype=bool)
        ours = np.asarray(connected_components(mask, connectivity=1))
        assert ours[0, 0] != ours[1, 1]
        ours8 = np.asarray(connected_components(mask, connectivity=2))
        assert ours8[0, 0] == ours8[1, 1]

    def test_snake(self):
        # long snaking component (diameter ~ H*W/2): needs pointer jumping
        # or an explicit iteration budget beyond the H+W default
        mask = np.zeros((32, 32), dtype=bool)
        for i in range(0, 32, 2):
            mask[i, :] = True
            if (i // 2) % 2 == 0:
                mask[i + 1, -1] = True
            elif i + 1 < 32:
                mask[i + 1, 0] = True
        ours = np.asarray(connected_components(mask, pointer_jumping=True,
                                               max_iters=4096))
        ref = label_oracle(mask)
        assert partition_equal(ours, ref)
        ours2 = np.asarray(connected_components(mask, max_iters=2048))
        assert partition_equal(ours2, ref)

    def test_relabel_sequential(self):
        labels = np.array([[0, 5], [9, 5]], dtype=np.int32)
        out = np.asarray(relabel_sequential(labels, max_labels=8))
        np.testing.assert_array_equal(out, [[0, 1], [2, 1]])


class TestRegionprops:
    def test_matches_oracle(self, blobs):
        labels = relabel_sequential(
            connected_components(blobs > 0), max_labels=32)
        props = regionprops(labels, max_labels=32)
        # align by centroid since ids may be permuted
        oracle = regionprops_oracle(np.asarray(labels))
        areas = np.asarray(props.area)
        n = int((areas > 0).sum())
        assert n == len(oracle)
        for o in oracle:
            i = o["label"] - 1
            assert areas[i] == o["area"]
            np.testing.assert_allclose(np.asarray(props.centroid)[i],
                                       o["centroid"], atol=1e-4)
            np.testing.assert_allclose(np.asarray(props.major_axis_length)[i],
                                       o["major_axis_length"], rtol=1e-4)
            np.testing.assert_allclose(np.asarray(props.equivalent_diameter)[i],
                                       o["equivalent_diameter"], rtol=1e-5)


class TestRegionpropsRadix:
    def test_radix_path_matches_segment_sum_path(self, rng, monkeypatch):
        """Frames beyond _RADIX_PIXELS compute the six per-id reductions +
        centroid lookup via ops/radix.py MXU matmuls (measured 279 -> 72
        ms/frame at 2048^2 cap 4096 on chip); results must match the
        segment_sum path to summation-order rounding."""
        import sys

        import jax.numpy as jnp

        rp = sys.modules["microbeseg_tpu.ops.regionprops"]
        S = 1152  # 1.3M px > the 2^20 gate
        labels = np.zeros((S, S), np.int32)
        k = 1
        for _ in range(300):
            cy, cx = rng.integers(6, S - 6, 2)
            r = int(rng.integers(2, 6))
            labels[cy - r:cy + r + 1, cx - r:cx + r + 1] = k
            k += 1
        ids = np.unique(labels)
        remap = np.zeros(ids.max() + 1, np.int64)
        remap[ids] = np.arange(len(ids))
        labels = remap[labels].astype(np.int32)

        radix = rp.regionprops(jnp.asarray(labels), max_labels=512)
        monkeypatch.setattr(rp, "_RADIX_PIXELS", 1 << 30)
        rp.regionprops.clear_cache()
        try:
            seg = rp.regionprops(jnp.asarray(labels), max_labels=512)
        finally:
            rp.regionprops.clear_cache()  # drop the monkeypatched trace
        for f in radix._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(radix, f)), np.asarray(getattr(seg, f)),
                atol=1e-3, rtol=1e-5, err_msg=f)


class TestRegionpropsPrecision:
    def test_axes_stable_at_far_coordinates(self):
        """Central moments must not cancel catastrophically at large frame
        coordinates (analysis runs regionprops on full frames): the same
        3-px-wide bar near (2000, 2000) must report the same axis lengths
        as one at the origin."""
        import jax.numpy as jnp

        far = np.zeros((2048, 2048), np.int32)
        far[2000:2003, 1960:2000] = 1
        near = np.zeros((64, 64), np.int32)
        near[5:8, 10:50] = 1
        p_far = regionprops(jnp.asarray(far), max_labels=4)
        p_near = regionprops(jnp.asarray(near), max_labels=4)
        np.testing.assert_allclose(
            np.asarray(p_far.minor_axis_length)[0],
            np.asarray(p_near.minor_axis_length)[0], rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(p_far.major_axis_length)[0],
            np.asarray(p_near.major_axis_length)[0], rtol=1e-4)


class TestWatershed:
    def _cells(self, rng, shape=(64, 64), centers=((20, 20), (20, 40), (44, 30))):
        """Synthetic cell-distance-like field: per-center cones."""
        h, w = shape
        yy, xx = np.mgrid[0:h, 0:w]
        cell = np.zeros(shape, np.float32)
        for cy, cx in centers:
            d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            cell = np.maximum(cell, np.clip(1 - d / 12.0, 0, 1))
        return cell

    def test_separates_touching_cells(self, rng):
        cell = self._cells(rng)
        mask = cell > 0.1
        seeds = label_oracle(cell > 0.6)
        ours = np.asarray(watershed(-cell, seeds, mask))
        ref = watershed_oracle(-cell, seeds, mask)
        # full coverage of the mask
        np.testing.assert_array_equal(ours > 0, np.asarray(ref) > 0)
        assert len(np.unique(ours)) == len(np.unique(ref))
        assert masks_iou(ours, ref) > 0.99

    def test_floods_beyond_fixed_budget(self):
        """A serpentine 1-px channel with geodesic length >> 768 must flood
        completely: the cleanup bound is the true geodesic H*W, not the old
        fixed 512 (which left far pixels unlabeled on sparse-seeded
        frames)."""
        H, W = 48, 49
        mask = np.zeros((H, W), bool)
        for r in range(0, H, 2):
            mask[r, :W - 1] = True
            if r + 1 < H:
                mask[r + 1, W - 2 if (r // 2) % 2 == 0 else 0] = True
        seeds = np.zeros((H, W), np.int32)
        seeds[0, 0] = 1
        img = np.zeros((H, W), np.float32)
        out = np.asarray(watershed(img, seeds, mask))
        np.testing.assert_array_equal(out > 0, mask)

    def test_respects_mask_and_markers(self, rng):
        cell = self._cells(rng, centers=((30, 30),))
        mask = cell > 0.1
        seeds = label_oracle(cell > 0.6)
        ours = np.asarray(watershed(-cell, seeds, mask))
        assert set(np.unique(ours)) == {0, 1}
        np.testing.assert_array_equal(ours > 0, mask)


class TestWatershedFast:
    def _cells(self, rng, shape=(64, 64), centers=((20, 20), (20, 40), (44, 30))):
        h, w = shape
        yy, xx = np.mgrid[0:h, 0:w]
        cell = np.zeros(shape, np.float32)
        for cy, cx in centers:
            d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            cell = np.maximum(cell, np.clip(1 - d / 12.0, 0, 1))
        return cell

    def test_parity_with_flood_oracle(self, rng):
        from microbeseg_tpu.ops.watershed import watershed_fast
        cell = self._cells(rng)
        mask = cell > 0.1
        seeds = label_oracle(cell > 0.6)
        ours = np.asarray(watershed_fast(-cell, seeds, mask))
        ref = watershed_oracle(-cell, seeds, mask)
        np.testing.assert_array_equal(ours > 0, np.asarray(ref) > 0)
        assert len(np.unique(ours)) == len(np.unique(ref))
        assert masks_iou(ours, ref) > 0.99

    def test_parity_on_random_blob_fields(self, rng):
        """Fast vs exact-ish flood on realistic blob prediction fields."""
        from microbeseg_tpu.ops.postprocessing import distance_postprocessing
        from tests.conftest import synthetic_blobs
        from tests.oracles import distance_label_oracle, regionprops_oracle
        mask = synthetic_blobs(rng, shape=(96, 96), n_blobs=7)
        props = regionprops_oracle(mask)
        mal = max(p["major_axis_length"] for p in props)
        cell, nb = distance_label_oracle(mask, int(np.ceil(0.75 * mal)))
        slow = np.asarray(distance_postprocessing(nb, cell, 0.45, 0.10))
        fast = np.asarray(distance_postprocessing(nb, cell, 0.45, 0.10,
                                                  method="fast"))
        np.testing.assert_array_equal(fast > 0, slow > 0)
        assert len(np.unique(fast)) == len(np.unique(slow))
        assert masks_iou(fast, slow) > 0.99
