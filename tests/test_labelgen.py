"""Golden-parity tests for label generation vs reference-algorithm oracles
(SURVEY.md §4(b): distance_label parity is the core quality gate)."""

import numpy as np
import pytest

from microbeseg_tpu.ops import labelgen
from tests.conftest import synthetic_blobs
from tests.oracles import (
    border_label_oracle,
    boundary_label_oracle,
    distance_label_oracle,
    regionprops_oracle,
)


def touching_pair(shape=(64, 64)):
    """Two touching ellipses plus a separate disk, exercising borders + gaps."""
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w]
    m = np.zeros(shape, np.uint16)
    m[((yy - 28) / 10.0) ** 2 + ((xx - 22) / 7.0) ** 2 <= 1] = 1
    m[((yy - 28) / 10.0) ** 2 + ((xx - 37) / 7.0) ** 2 <= 1] = np.where(
        m[((yy - 28) / 10.0) ** 2 + ((xx - 37) / 7.0) ** 2 <= 1] == 0, 2, 1)
    m[(yy - 50) ** 2 + (xx - 50) ** 2 <= 36] = 3
    return m


def close_pair(shape=(64, 64), gap=2):
    """Two disks separated by a small gap (bottom-hat closing territory)."""
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w]
    m = np.zeros(shape, np.uint16)
    m[(yy - 32) ** 2 + (xx - 20) ** 2 <= 81] = 1
    m[(yy - 32) ** 2 + (xx - 20 + 18 + gap) ** 2 <= 81] = 2
    return m


def rod_chain(shape=(64, 64)):
    """Touching end-to-end chain of rotated capsules (rod-shaped bacteria
    morphology) plus an isolated rod — high-aspect instances whose major
    axis drives the label-gen search radius."""
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w]
    m = np.zeros(shape, np.uint16)

    def capsule(cy, cx, theta, half, r):
        uy, ux = np.cos(theta), np.sin(theta)
        t = np.clip((yy - cy) * uy + (xx - cx) * ux, -half, half)
        return np.hypot(yy - cy - t * uy, xx - cx - t * ux) <= r

    chain = [(20, 14, 0.5), (29, 28, 0.75), (40, 40, 0.9)]
    for label, (cy, cx, theta) in enumerate(chain, start=1):
        blob = capsule(cy, cx, theta, half=7, r=4)
        m[blob & (m == 0)] = label
    m[capsule(50, 16, 2.2, half=9, r=3) & (m == 0)] = len(chain) + 1
    return m


def _max_mal(mask):
    props = regionprops_oracle(mask)
    return int(np.ceil(max(p["major_axis_length"] for p in props)))


class TestBoundaryBorder:
    def test_boundary_label(self, rng):
        mask = touching_pair()
        ours = np.asarray(labelgen.boundary_label(mask.astype(np.int32)))
        np.testing.assert_array_equal(ours, boundary_label_oracle(mask))

    def test_border_label(self):
        mask = touching_pair()
        ours = np.asarray(labelgen.border_label(mask.astype(np.int32)))
        np.testing.assert_array_equal(ours, border_label_oracle(mask))

    def test_border_empty_when_no_touching(self, blobs):
        # construct non-touching: erode-free synthetic disks rarely touch;
        # just check types/range
        ours = np.asarray(labelgen.border_label(blobs.astype(np.int32)))
        assert ours.dtype == np.uint8
        assert set(np.unique(ours)) <= {0, 1, 2}


class TestDistanceLabel:
    @pytest.mark.parametrize("maskgen", [touching_pair, close_pair,
                                         rod_chain])
    def test_golden_parity(self, maskgen):
        mask = maskgen()
        max_mal = _max_mal(mask)
        radius = int(np.ceil(0.75 * max_mal))
        ref_cell, ref_nb = distance_label_oracle(mask, radius)
        out = labelgen.get_label(mask, "distance", max_mal=max_mal)
        cell, nb = out
        np.testing.assert_allclose(cell, ref_cell, atol=2e-3)
        np.testing.assert_allclose(nb, ref_nb, atol=2e-3)

    def test_blobs_parity(self, blobs):
        max_mal = _max_mal(blobs)
        radius = int(np.ceil(0.75 * max_mal))
        ref_cell, ref_nb = distance_label_oracle(blobs, radius)
        cell, nb = labelgen.get_label(blobs, "distance", max_mal=max_mal)
        np.testing.assert_allclose(cell, ref_cell, atol=2e-3)
        np.testing.assert_allclose(nb, ref_nb, atol=2e-3)

    def test_cell_dist_only(self):
        mask = touching_pair()
        max_mal = _max_mal(mask)
        cell = labelgen.get_label(mask, "cell_dist", max_mal=max_mal)
        ref_cell, _ = distance_label_oracle(mask, int(np.ceil(0.75 * max_mal)))
        np.testing.assert_allclose(cell, ref_cell, atol=2e-3)

    def test_max_major_axis_length(self):
        mask = touching_pair()
        assert labelgen.max_major_axis_length(mask) == _max_mal(mask)

    def test_elongated_instance_nonsquare_image(self):
        """An instance whose search window exceeds min(H, W) must still get
        a full, centered window: get_label pads the canvas to the window
        bucket instead of shrinking the window (a shrunken window was
        truncated AND could exclude the centroid on non-square images)."""
        mask = np.zeros((96, 320), np.uint16)
        mask[40:46, 60:260] = 1          # 200-px bar: radius 150 > 96/2
        mask[20:30, 280:300] = 2         # a neighbor
        max_mal = _max_mal(mask)
        radius = int(np.ceil(0.75 * max_mal))
        assert 2 * radius > 96           # the old min(H, W) clamp would bite
        ref_cell, ref_nb = distance_label_oracle(mask, radius)
        cell, nb = labelgen.get_label(mask, "distance", max_mal=max_mal)
        assert cell.shape == mask.shape
        np.testing.assert_allclose(cell, ref_cell, atol=2e-3)
        np.testing.assert_allclose(nb, ref_nb, atol=2e-3)


class TestOtherLabels:
    def test_j4_runs(self):
        mask = touching_pair()
        out = np.asarray(labelgen.j4_label(mask.astype(np.int32)))
        assert set(np.unique(out)) <= {0, 1, 2, 3}

    def test_j4_matches_reference_oracle(self, rng):
        """Literal numpy re-implementation of the reference algorithm
        (train_data_representations.py:158-217: bottom-hat closing + the
        O(HW) set-based neighbor-instance count)."""
        from itertools import product

        from scipy import ndimage

        from tests.oracles import _disk

        k_neighbors, se_radius = 2, 4
        label = touching_pair().astype(np.int32)[::2, ::2]  # 32x32

        label_bin = label > 0
        bottom_hat = ndimage.binary_closing(
            label_bin, _disk(se_radius)) ^ label_bin
        padded = np.pad(label, k_neighbors)
        n_neighbors = np.zeros_like(label)
        for iy, ix in product(range(label.shape[0]), range(label.shape[1])):
            crop = padded[iy:iy + 2 * k_neighbors + 1,
                          ix:ix + 2 * k_neighbors + 1]
            n_neighbors[iy, ix] = len(set(crop[crop > 0]))
        bg = (~label_bin) & (~bottom_hat)
        gap = (~label_bin) & bottom_hat
        touching = label_bin & (n_neighbors > 1)
        cell = ~(bg | gap | touching)
        ref = np.maximum(bg.astype(np.int32), 2 * cell)
        ref = np.maximum(ref, 3 * touching)
        ref = np.maximum(ref, 4 * gap) - 1

        ours = np.asarray(labelgen.j4_label(label, k_neighbors=k_neighbors,
                                            se_radius=se_radius))
        np.testing.assert_array_equal(ours, ref.astype(np.uint8))

    def test_adapted_border_runs(self):
        mask = touching_pair()
        out = np.asarray(labelgen.adapted_border_label(mask.astype(np.int32)))
        assert set(np.unique(out)) <= {0, 1, 2}

    def test_canny_edges_thin_and_located(self):
        """The on-device Canny (reference uses cv2.Canny(label, 1, 1))
        produces NMS-thinned edges at label transitions."""
        import jax.numpy as jnp

        m = np.zeros((32, 32), np.int32)
        m[8:24, 8:24] = 1
        edges = np.asarray(labelgen._canny_edges(jnp.asarray(m)))
        ys, xs = np.nonzero(edges)
        # all edge pixels within 1 px of the square's boundary band
        assert len(ys) > 0
        inner = (ys >= 7) & (ys <= 24) & (xs >= 7) & (xs <= 24)
        assert inner.all()
        # NMS-thinned: roughly one pixel per boundary position, not a
        # two-pixel-wide transition band (perimeter of 16x16 square = 60)
        assert len(ys) <= 72

    def test_adapted_border_marks_touching_interface_only(self):
        """boundary XOR border leaves only the touching interface (reference
        :144-148): an isolated object yields no border class at all."""
        solo = np.zeros((24, 24), np.int32)
        solo[6:18, 6:18] = 1
        out = np.asarray(labelgen.adapted_border_label(solo))
        assert 2 not in np.unique(out)

        pair = touching_pair()
        out = np.asarray(labelgen.adapted_border_label(pair.astype(np.int32)))
        border_ys, border_xs = np.nonzero(out == 2)
        assert len(border_ys) > 0
        # Canny-XOR marks the crease where two DIFFERENT ids come close
        # (cv2's Sobel support reaches 1 px past each object); every
        # border-class pixel must lie near such a multi-id neighborhood
        from scipy import ndimage
        ids = pair.astype(np.int64)
        multi = np.zeros_like(pair, bool)
        uniq = [i for i in np.unique(ids) if i > 0]
        grown = {i: ndimage.binary_dilation(ids == i, iterations=2)
                 for i in uniq}
        for a in uniq:
            for b in uniq:
                if a < b:
                    multi |= grown[a] & grown[b]
        near = ndimage.binary_dilation(multi, iterations=2)
        assert near[border_ys, border_xs].all()

    def test_dispatch_unknown(self):
        with pytest.raises(ValueError):
            labelgen.get_label(np.zeros((8, 8)), "nope")


class TestGapRingSums:
    def test_scatter_path_matches_oracle_and_vmap(self, rng):
        """Above 256 gap slots the ring sums switch from the per-gap vmap
        (O(max_gaps*H*W) intermediates) to a shift-dedup scatter-add linear
        in pixels; both must equal the scipy ring oracle."""
        import jax.numpy as jnp
        from scipy import ndimage

        g = rng.integers(0, 300, (48, 48)).astype(np.int32)
        nb = rng.random((48, 48)).astype(np.float32)

        def oracle(max_gaps):
            exp = np.zeros(max_gaps, np.float64)
            for gid in range(1, max_gaps + 1):
                region = g == gid
                if not region.any():
                    continue
                ring = ndimage.binary_dilation(
                    region, np.ones((3, 3), bool)) ^ region
                exp[gid - 1] = nb[ring].sum()
            return exp

        scatter = np.asarray(labelgen._gap_ring_sums(
            jnp.asarray(g), jnp.asarray(nb), 300))
        np.testing.assert_allclose(scatter, oracle(300), rtol=1e-5)
        vmap = np.asarray(labelgen._gap_ring_sums(
            jnp.asarray(np.where(g <= 200, g, 0)), jnp.asarray(nb), 200))
        g = np.where(g <= 200, g, 0).astype(np.int32)
        np.testing.assert_allclose(vmap, oracle(200), rtol=1e-5)
