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
