"""Post-processing parity tests vs reference-algorithm oracles."""

import numpy as np

from microbeseg_tpu.ops.postprocessing import (
    boundary_postprocessing,
    distance_postprocessing,
    distance_postprocessing_grid,
)
from tests.conftest import synthetic_blobs
from tests.oracles import (
    boundary_postprocessing_oracle,
    distance_postprocessing_oracle,
    distance_label_oracle,
    masks_iou,
    regionprops_oracle,
)


def _predictions(rng, shape=(96, 96), n_blobs=7):
    """Clean cell/neighbor 'predictions' derived from a synthetic mask."""
    mask = synthetic_blobs(rng, shape=shape, n_blobs=n_blobs)
    props = regionprops_oracle(mask)
    max_mal = int(np.ceil(max(p["major_axis_length"] for p in props)))
    cell, nb = distance_label_oracle(mask, int(np.ceil(0.75 * max_mal)))
    return mask, cell, nb


class TestDistancePostprocessing:
    def test_parity_with_oracle(self, rng):
        mask, cell, nb = _predictions(rng)
        ours = np.asarray(distance_postprocessing(nb, cell, 0.45, 0.10))
        ref = distance_postprocessing_oracle(nb, cell, 0.45, 0.10)
        np.testing.assert_array_equal(ours > 0, ref > 0)
        assert len(np.unique(ours)) == len(np.unique(ref))
        assert masks_iou(ours, ref) > 0.99

    def test_instance_count_matches_gt(self, rng):
        mask, cell, nb = _predictions(rng)
        ours = np.asarray(distance_postprocessing(nb, cell, 0.45, 0.10))
        n_gt = len(np.unique(mask)) - 1
        n_pred = len(np.unique(ours)) - 1
        assert n_pred == n_gt

    def test_threshold_grid(self, rng):
        mask, cell, nb = _predictions(rng, shape=(64, 64), n_blobs=4)
        ths = [(c, s) for c in (0.05, 0.10) for s in (0.35, 0.45)]
        grid = np.asarray(distance_postprocessing_grid(nb, cell, np.array(ths)))
        assert grid.shape == (4, 64, 64)
        for (tc, ts), g in zip(ths, grid):
            single = np.asarray(distance_postprocessing(nb, cell, ts, tc))
            np.testing.assert_array_equal(g, single)

    def test_empty_prediction(self):
        z = np.zeros((32, 32), np.float32)
        ours = np.asarray(distance_postprocessing(z, z, 0.45, 0.10))
        assert ours.sum() == 0


class TestBoundaryPostprocessing:
    def test_parity_with_oracle(self, rng):
        mask = synthetic_blobs(rng, shape=(64, 64), n_blobs=5)
        # fabricate softmax-like maps: interior=cell, ring=boundary
        from scipy import ndimage as ndi
        interior = ndi.binary_erosion(mask > 0, np.ones((3, 3)))
        ring = (mask > 0) & ~interior
        pred = np.zeros((64, 64, 3), np.float32)
        pred[..., 1] = np.where(interior, 0.9, np.where(ring, 0.3, 0.05))
        pred[..., 2] = np.where(ring, 0.6, 0.05)
        pred[..., 0] = 1 - pred[..., 1] - pred[..., 2]
        ours = np.asarray(boundary_postprocessing(pred))
        ref = boundary_postprocessing_oracle(pred)
        np.testing.assert_array_equal(ours > 0, ref > 0)
        assert masks_iou(ours, ref) > 0.99


class TestChunkedSeedPrune:
    def test_speckle_beyond_cap_does_not_drop_real_seeds(self):
        """Round-5 on-chip boundary-gate incident: the prune used to cap
        RAW raster-order component ranks at max_seeds BEFORE the area
        prune, so when 1-px speckle outnumbered the cap, real seeds late
        in raster order were silently deleted (the reference prunes by
        area over ALL components, postprocessing.py:33-38/:81-85).  600
        speckles above 3 real seeds must leave exactly the 3 real seeds."""
        import jax.numpy as jnp

        import microbeseg_tpu.ops.postprocessing as pp

        seeds = np.zeros((160, 160), bool)
        for k in range(600):  # rank-early 1-px speckles, non-adjacent
            seeds[2 * (k // 75), 2 * (k % 75) + 1] = True
        real = [(120, 20), (130, 80), (150, 140)]
        for cy, cx in real:
            seeds[cy - 2:cy + 3, cx - 2:cx + 3] = True  # 25 px each
        for rel_mean in (0.0, 0.10):  # boundary / distance configs
            out = np.asarray(pp._prune_small_seeds(
                jnp.asarray(seeds), min_area_floor=4.0,
                rel_mean=rel_mean, max_seeds=256))
            assert int(out.max()) == 3
            assert len(np.unique(out)) == 4  # 0 + three real seeds
            got = {int(out[cy, cx]) for cy, cx in real}
            assert got == {1, 2, 3}
            assert out[seeds & (out == 0)].size == 600  # speckles pruned

    def test_large_frame_postprocessing_end_to_end(self, rng):
        """distance_postprocessing at a frame size whose pixel count exceeds
        the one-hot chunk (the tiled-inference full-frame postproc path)."""
        mask, cell, nb = _predictions(rng, shape=(288, 288), n_blobs=10)
        ours = np.asarray(distance_postprocessing(nb, cell, 0.45, 0.10))
        ref = distance_postprocessing_oracle(nb, cell, 0.45, 0.10)
        assert masks_iou(ours, ref) > 0.99


class TestGridSequencingOnBigFrames:
    def test_grid_map_branch_matches_per_threshold_calls(self, rng):
        """Frames beyond the VMEM side limit run the threshold grid via
        lax.map (a vmapped axis would multiply into the tiled flood's
        pallas grid past Mosaic's scoped-VMEM tolerance); results must
        equal per-threshold direct calls.  A narrow 800-px frame keeps
        the check cheap while triggering the big-frame branch."""
        import jax.numpy as jnp

        from microbeseg_tpu.ops.postprocessing import (
            distance_postprocessing, distance_postprocessing_grid)

        H, W = 800, 64  # max side > 768
        cell = np.zeros((H, W), np.float32)
        yy, xx = np.mgrid[0:H, 0:W]
        for _ in range(20):
            cy, cx = rng.integers(10, H - 10), rng.integers(10, W - 10)
            d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            cell = np.maximum(cell, np.clip(1 - d / 7.0, 0, 1))
        border = np.clip(cell - np.roll(cell, 2, axis=0), 0, 0.3)
        ths = np.array([[0.05, 0.35], [0.10, 0.45], [0.125, 0.45]],
                       np.float32)
        grid = np.asarray(distance_postprocessing_grid(
            jnp.asarray(border), jnp.asarray(cell), ths, max_seeds=512))
        for i, (tc, ts) in enumerate(ths):
            direct = np.asarray(distance_postprocessing(
                jnp.asarray(border), jnp.asarray(cell), ts, tc,
                max_seeds=512))
            np.testing.assert_array_equal(grid[i], direct)


class TestRadixPrune:
    def test_radix_path_matches_small_cap_path(self, rng):
        """The large-cap radix-matmul prune (cap > 256) must be bit-identical
        to the small-cap one-hot path on inputs where neither cap binds."""
        import jax.numpy as jnp

        import microbeseg_tpu.ops.postprocessing as pp

        seeds = np.zeros((96, 96), bool)
        for _ in range(30):
            cy, cx = rng.integers(4, 92, 2)
            r = int(rng.integers(1, 4))
            seeds[cy - r:cy + r + 1, cx - r:cx + r + 1] = True
        small = np.asarray(pp._prune_small_seeds(
            jnp.asarray(seeds), 4.0, 0.10, max_seeds=256))
        radix = np.asarray(pp._prune_small_seeds(
            jnp.asarray(seeds), 4.0, 0.10, max_seeds=300))
        np.testing.assert_array_equal(small, radix)

    def test_radix_matches_numpy_oracle_many_ids(self, rng):
        """Exactness of the radix histogram/remap at a multi-thousand-id
        capacity (the area-scaled full-frame configuration)."""
        import jax.numpy as jnp

        import microbeseg_tpu.ops.postprocessing as pp

        H = W = 512
        rank = np.zeros((H, W), np.int32)
        for k in range(1, 501):
            cy, cx = rng.integers(4, H - 4, 2)
            r = int(rng.integers(1, 5))
            rank[cy - r:cy + r + 1, cx - r:cx + r + 1] = k
        ids = np.unique(rank)
        remap = np.zeros(ids.max() + 1, np.int64)
        remap[ids] = np.arange(len(ids))
        rank = remap[rank].astype(np.int32)

        cap = 2048
        out = np.asarray(pp._prune_radix(jnp.asarray(rank), cap, 4.0, 0.10))

        areas = np.bincount(rank.reshape(-1), minlength=cap + 1).astype(float)
        areas[0] = 0
        n = (areas > 0).sum()
        min_area = max(0.10 * areas.sum() / max(n, 1) if n else 0.0, 4.0)
        kept = areas > min_area
        newid = np.cumsum(kept.astype(np.int64)) * kept
        ref = newid[rank.reshape(-1)].reshape(rank.shape)
        np.testing.assert_array_equal(out, ref)


class TestLargeInstanceCounts:
    def test_cap_scales_beyond_256_instances(self, rng):
        """Full-frame post-processing must keep >256 instances when given a
        large enough cap (the round-3 scale run showed a fixed 256 cap
        silently dropping >85% of cells on 1024^2+ frames)."""
        # ~420 tiny cells on a 416^2 field
        size, grid = 416, 21
        cell = np.zeros((size, size), np.float32)
        yy, xx = np.mgrid[0:size, 0:size]
        for gy in range(grid):
            for gx in range(grid):
                cy, cx = 10 + gy * 19, 10 + gx * 19
                d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
                cell = np.maximum(cell, np.clip(1 - d / 6.0, 0, 1))
        border = np.zeros_like(cell)
        capped = np.asarray(distance_postprocessing(
            border, cell, 0.45, 0.10, max_seeds=256))
        scaled = np.asarray(distance_postprocessing(
            border, cell, 0.45, 0.10, max_seeds=1024))
        assert len(np.unique(capped)) - 1 <= 256
        n_scaled = len(np.unique(scaled)) - 1
        assert n_scaled == grid * grid  # every cell kept

    def test_engine_seeds_cap_scaling(self):
        from microbeseg_tpu.inference.engine import InferenceEngine

        eng = InferenceEngine(model=None, variables=None)
        assert eng._seeds_cap(256, 256) == 256
        assert eng._seeds_cap(1024, 1024) == 4096
        assert eng._seeds_cap(4096, 4096) == 32768  # clamped
        pinned = InferenceEngine(model=None, variables=None, max_seeds=64)
        assert pinned._seeds_cap(4096, 4096) == 64
