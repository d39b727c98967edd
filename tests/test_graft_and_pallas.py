"""Driver-contract smoke tests + Pallas kernel interpret-mode checks."""

import numpy as np
import pytest


class TestPallasFlood:
    def test_interpret_matches_xla_flood(self, rng):
        """Tiny config (interpret mode is slow): pallas flood == XLA flood."""
        import jax.numpy as jnp
        from microbeseg_tpu.ops.pallas.flood import flood_pallas
        from microbeseg_tpu.ops.watershed import watershed

        N = 32
        yy, xx = np.mgrid[0:N, 0:N]
        cell = np.maximum(
            np.clip(1 - np.sqrt((yy - 10) ** 2 + (xx - 10) ** 2) / 8, 0, 1),
            np.clip(1 - np.sqrt((yy - 22) ** 2 + (xx - 20) ** 2) / 8, 0, 1),
        ).astype(np.float32)
        mask = cell > 0.1
        from scipy import ndimage
        seeds, _ = ndimage.label(cell > 0.6, structure=np.ones((3, 3)))
        seeds = seeds.astype(np.int32)

        ref = np.asarray(watershed(-cell, seeds, mask, n_levels=8,
                                   inner_steps=1, max_final_iters=32))
        ours = np.asarray(flood_pallas(-cell, seeds, mask, n_levels=8,
                                       inner_steps=1, max_final_iters=32,
                                       interpret=True))
        np.testing.assert_array_equal(ours, ref)

    def test_non_tile_multiple_sizes_are_padded(self, rng):
        """Mosaic only lowers (8,128)-tile-multiple shapes; odd sizes must
        pad to the tile grid and crop back (a 400x400 frame aborted
        compilation before this)."""
        import jax.numpy as jnp
        from microbeseg_tpu.ops.pallas.flood import flood_pallas
        from microbeseg_tpu.ops.watershed import watershed

        H, W = 30, 46
        yy, xx = np.mgrid[0:H, 0:W]
        cell = np.maximum(
            np.clip(1 - np.sqrt((yy - 12) ** 2 + (xx - 12) ** 2) / 7, 0, 1),
            np.clip(1 - np.sqrt((yy - 16) ** 2 + (xx - 32) ** 2) / 7, 0, 1),
        ).astype(np.float32)
        mask = cell > 0.1
        from scipy import ndimage
        seeds, _ = ndimage.label(cell > 0.6, structure=np.ones((3, 3)))
        ref = np.asarray(watershed(-cell, seeds.astype(np.int32), mask,
                                   n_levels=8, inner_steps=1,
                                   max_final_iters=32))
        ours = np.asarray(flood_pallas(-cell, seeds.astype(np.int32), mask,
                                       n_levels=8, inner_steps=1,
                                       max_final_iters=32, interpret=True))
        assert ours.shape == (H, W)
        np.testing.assert_array_equal(ours, ref)

    def test_fallback_for_large_images(self):
        from microbeseg_tpu.ops.pallas import flood
        assert flood.MAX_VMEM_SIDE < 8192  # big frames must fall back


def _blob_field(rng, size, n_blobs=24):
    yy, xx = np.mgrid[0:size, 0:size]
    cell = np.zeros((size, size), np.float32)
    for _ in range(n_blobs):
        cy, cx = rng.integers(10, size - 10, 2)
        r = int(rng.integers(6, 14))
        cell = np.maximum(
            cell, np.clip(1 - np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2) / r,
                          0, 1))
    from scipy import ndimage
    seeds, _ = ndimage.label(cell > 0.6)
    return cell, seeds.astype(np.int32), cell > 0.1


class TestFloodTiled:
    """flood_tiled: the large-frame window flood (global quantization,
    per-window VMEM flood, interior paste, XLA cleanup)."""

    def test_matches_xla_flood(self, rng):
        import jax.numpy as jnp
        from microbeseg_tpu.ops.pallas.flood import flood_tiled
        from microbeseg_tpu.ops.watershed import watershed

        cell, seeds, mask = _blob_field(rng, 256)
        # the production 128 levels: at coarse quantization (8/32 levels)
        # plateau ties dominate and the layouts legitimately diverge up to
        # ~2% on single instances; at 128 the measured divergence is zero
        ref = np.asarray(watershed(jnp.asarray(-cell), jnp.asarray(seeds),
                                   jnp.asarray(mask), n_levels=128))
        out = np.asarray(flood_tiled(jnp.asarray(-cell), jnp.asarray(seeds),
                                     jnp.asarray(mask), n_levels=128,
                                     tile=64, halo=32, interpret=True))
        assert np.array_equal(out > 0, ref > 0)  # identical coverage
        for k in range(1, seeds.max() + 1):
            a, b = out == k, ref == k
            iou = (a & b).sum() / max((a | b).sum(), 1)
            assert iou >= 0.99, f"instance {k}: IoU {iou}"

    def test_vmap_over_frames(self, rng):
        """The engine vmaps post-processing over the frame batch."""
        import jax
        import jax.numpy as jnp
        from microbeseg_tpu.ops.pallas.flood import flood_tiled

        cell, seeds, mask = _blob_field(rng, 128, n_blobs=8)
        single = np.asarray(flood_tiled(
            jnp.asarray(-cell), jnp.asarray(seeds), jnp.asarray(mask),
            n_levels=8, tile=64, halo=32, interpret=True))
        batched = np.asarray(jax.vmap(
            lambda c, s, m: flood_tiled(c, s, m, n_levels=8, tile=64,
                                        halo=32, interpret=True))(
            jnp.asarray(-cell)[None], jnp.asarray(seeds)[None],
            jnp.asarray(mask)[None]))
        np.testing.assert_array_equal(batched[0], single)

    def test_chunked_window_batches(self, rng):
        """>16 windows run as lax.map over grid-16 pallas chunks (Mosaic's
        scoped-VMEM accounting grows with grid length); the chunked path
        must agree with the direct one."""
        import jax.numpy as jnp
        from microbeseg_tpu.ops.pallas.flood import flood_tiled

        cell, seeds, mask = _blob_field(rng, 320)  # 5x5 = 25 windows > 16
        out = np.asarray(flood_tiled(jnp.asarray(-cell), jnp.asarray(seeds),
                                     jnp.asarray(mask), n_levels=8,
                                     tile=64, halo=32, interpret=True))
        # windows sized to cover the frame in <= 16 tiles -> direct path
        direct = np.asarray(flood_tiled(jnp.asarray(-cell),
                                        jnp.asarray(seeds),
                                        jnp.asarray(mask), n_levels=8,
                                        tile=128, halo=64, interpret=True))
        assert np.array_equal(out > 0, direct > 0)
        agree = (out == direct).mean()
        assert agree > 0.995, f"tiled layouts disagree on {1-agree:.3%} px"

    def test_rod_basins_crossing_windows(self, rng):
        """Elongated capsule basins (longer than the halo) span window
        seams; the tiled flood's interior paste + cleanup must still cover
        every mask pixel and keep per-instance parity with the XLA flood."""
        import jax.numpy as jnp
        from microbeseg_tpu.ops.pallas.flood import flood_tiled
        from microbeseg_tpu.ops.watershed import watershed

        size = 256
        yy, xx = np.mgrid[0:size, 0:size]
        cell = np.zeros((size, size), np.float32)
        for _ in range(10):
            cy, cx = rng.integers(20, size - 20, 2)
            ang = rng.uniform(0, np.pi)
            L, r = 80, 7  # capsule much longer than the 32-px halo
            dy, dx = np.sin(ang), np.cos(ang)
            t = np.clip((yy - cy) * dy + (xx - cx) * dx, -L / 2, L / 2)
            d = np.sqrt((yy - cy - t * dy) ** 2 + (xx - cx - t * dx) ** 2)
            cell = np.maximum(cell, np.clip(1 - d / r, 0, 1))
        from scipy import ndimage
        seeds, _ = ndimage.label(cell > 0.6)
        mask = cell > 0.1

        ref = np.asarray(watershed(jnp.asarray(-cell),
                                   jnp.asarray(seeds.astype(np.int32)),
                                   jnp.asarray(mask), n_levels=128))
        out = np.asarray(flood_tiled(jnp.asarray(-cell),
                                     jnp.asarray(seeds.astype(np.int32)),
                                     jnp.asarray(mask), n_levels=128,
                                     tile=64, halo=32, interpret=True))
        assert np.array_equal(out > 0, ref > 0)  # full coverage
        for k in range(1, seeds.max() + 1):
            a, b = out == k, ref == k
            iou = (a & b).sum() / max((a | b).sum(), 1)
            assert iou >= 0.99, f"rod {k}: IoU {iou}"

    def test_beyond_12bit_labels(self, rng):
        """The tiled path carries 24-bit labels: ids above 4095 must come
        through unscathed (the 12-bit crop kernel would corrupt them)."""
        import jax.numpy as jnp
        from microbeseg_tpu.ops.pallas.flood import flood_tiled

        cell, seeds, mask = _blob_field(rng, 128, n_blobs=8)
        shifted = np.where(seeds > 0, seeds + 5000, 0).astype(np.int32)
        out = np.asarray(flood_tiled(jnp.asarray(-cell),
                                     jnp.asarray(shifted),
                                     jnp.asarray(mask), n_levels=8,
                                     tile=64, halo=32, interpret=True))
        got = set(np.unique(out)) - {0}
        assert got == set(np.unique(shifted)) - {0}


class TestPropagateWarmstarts:
    """Windowed VMEM warm starts for CC / rank flooding (pallas/propagate).

    Contract: the warm start is a valid INTERMEDIATE state of the global
    monotone max-propagation (init <= warm <= unique fixed point), so the
    caller's XLA loop always finishes to the exact same answer."""

    @staticmethod
    def _seed_field(rng, size=256):
        seeds = np.zeros((size, size), bool)
        for _ in range(60):
            cy, cx = rng.integers(4, size - 4, 2)
            r = int(rng.integers(1, 5))
            seeds[cy - r:cy + r + 1, cx - r:cx + r + 1] = True
        # one snaking component longer than any window halo
        for i in range(200):
            seeds[10 + i % 3, 10 + i] = True
        return seeds

    def _cc_fixed_point(self, seeds):
        """Numpy oracle: 8-connected neighbor-max to the fixed point."""
        from scipy.ndimage import maximum_filter
        idx = (np.arange(seeds.size, dtype=np.int64) + 1).reshape(seeds.shape)
        lab = np.where(seeds, idx, 0)
        while True:
            new = np.where(seeds, maximum_filter(lab, size=3), 0)
            if (new == lab).all():
                return lab
            lab = new

    def test_cc_warmstart_is_valid_intermediate_state(self, rng):
        import jax.numpy as jnp
        from microbeseg_tpu.ops.pallas.propagate import cc_warmstart

        seeds = self._seed_field(rng)
        idx = (np.arange(seeds.size, dtype=np.int32) + 1).reshape(seeds.shape)
        labels0 = np.where(seeds, idx, 0).astype(np.int32)
        warm = np.asarray(cc_warmstart(jnp.asarray(labels0),
                                       tile=64, halo=32, interpret=True))
        fixed = self._cc_fixed_point(seeds)
        assert (warm >= labels0).all() and (warm <= fixed).all()
        # continuing the global iteration from the warm state reaches the
        # same fixed point (confluence of monotone max-propagation)
        from scipy.ndimage import maximum_filter
        lab = warm.astype(np.int64)
        for _ in range(1000):
            new = np.where(seeds, maximum_filter(lab, size=3), 0)
            if (new == lab).all():
                break
            lab = new
        np.testing.assert_array_equal(lab, fixed)

    def test_rank_warmstart_is_valid_intermediate_state(self, rng):
        import jax.numpy as jnp
        from microbeseg_tpu.ops.pallas.propagate import rank_warmstart

        seeds = self._seed_field(rng)
        fixed_cc = self._cc_fixed_point(seeds).astype(np.int32)
        idx = (np.arange(seeds.size, dtype=np.int32) + 1).reshape(seeds.shape)
        roots = (fixed_cc == idx) & seeds
        seq = np.cumsum(roots.reshape(-1).astype(np.int32)).reshape(
            seeds.shape)
        rank0 = np.where(roots, seq, 0).astype(np.int32)
        warm = np.asarray(rank_warmstart(jnp.asarray(fixed_cc),
                                         jnp.asarray(rank0),
                                         tile=64, halo=32, interpret=True))
        # fixed point: every component pixel carries its root's rank
        from scipy.ndimage import maximum_filter
        rank = rank0.copy()
        while True:
            new = np.where(seeds, maximum_filter(rank, size=3), 0)
            if (new == rank).all():
                break
            rank = new
        assert (warm >= rank0).all() and (warm <= rank).all()
        # ungated windowed spread must not leak ranks across components
        for k in np.unique(fixed_cc)[1:]:
            vals = set(np.unique(warm[fixed_cc == k])) - {0}
            root_rank = rank[fixed_cc == k].max()
            assert vals <= {0, root_rank} or vals <= {root_rank}

    def test_sequentialize_matches_small_path_on_big_frame(self, rng):
        """End-to-end: sequentialize_components on a 2500^2-class frame
        (above the warm-start threshold) still equals the plain path.  On
        the CPU test backend the warm start is gated off, so this guards
        the gating logic itself."""
        import jax.numpy as jnp
        from microbeseg_tpu.ops.cc import (connected_components,
                                           sequentialize_components)

        seeds = np.zeros((2304, 128), bool)  # tall frame > 2048 on one side
        for _ in range(40):
            cy = int(rng.integers(4, 2300))
            cx = int(rng.integers(4, 124))
            seeds[cy - 2:cy + 3, cx - 2:cx + 3] = True
        cc = connected_components(jnp.asarray(seeds))
        rank = np.asarray(sequentialize_components(cc))
        n = len(np.unique(rank)) - 1
        assert rank.max() == n  # ranks are 1..n


class TestGraftEntry:
    def test_entry_shapes(self):
        import jax
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.eval_shape(fn, *args)
        border, cell = out
        assert border.shape == (1, 128, 128, 1)
        assert cell.shape == (1, 128, 128, 1)
