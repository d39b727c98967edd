"""Unit tests for host-side utilities (tiff I/O, normalization, padding)."""

import numpy as np
import pytest

from microbeseg_tpu.utils import (
    border_correction,
    get_nucleus_ids,
    imread,
    imwrite,
    min_max_normalization,
    pad_bucket_shape,
    zero_pad_model_input,
)


class TestTiff:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32, np.int32])
    def test_roundtrip_2d(self, tmp_path, rng, dtype):
        if np.issubdtype(dtype, np.integer):
            arr = rng.integers(0, np.iinfo(dtype).max, size=(37, 53)).astype(dtype)
        else:
            arr = rng.random((37, 53)).astype(dtype)
        p = tmp_path / "x.tif"
        imwrite(p, arr)
        back = imread(p)
        np.testing.assert_array_equal(back, arr)

    def test_roundtrip_stack(self, tmp_path, rng):
        arr = rng.integers(0, 65535, size=(4, 20, 30)).astype(np.uint16)
        p = tmp_path / "stack.tif"
        imwrite(p, arr)
        back = imread(p)
        assert back.shape == (4, 20, 30)
        np.testing.assert_array_equal(back, arr)

    def test_rgb_roundtrip(self, tmp_path, rng):
        arr = rng.integers(0, 255, size=(16, 24, 3)).astype(np.uint8)
        p = tmp_path / "rgb.tif"
        imwrite(p, arr)
        back = imread(p)
        np.testing.assert_array_equal(back, arr)

    def test_imread_page(self, tmp_path, rng):
        from microbeseg_tpu.utils.tiff import imread_page
        arr = rng.integers(0, 65535, size=(5, 20, 30)).astype(np.uint16)
        p = tmp_path / "stack.tif"
        imwrite(p, arr)
        for t in (0, 2, 4):
            np.testing.assert_array_equal(imread_page(p, t), arr[t])
        # single-frame file: page 0 works, page 1 raises
        q = tmp_path / "one.tif"
        imwrite(q, arr[0])
        np.testing.assert_array_equal(imread_page(q, 0), arr[0])
        with pytest.raises(IndexError):
            imread_page(q, 1)
        with pytest.raises(IndexError):
            imread_page(p, 5)


class TestNormalization:
    def test_full_range(self):
        img = np.array([[0, 65535]], dtype=np.uint16)
        out = min_max_normalization(img, 0, 65535)
        np.testing.assert_allclose(out, [[-1.0, 1.0]])

    def test_clipping(self):
        img = np.array([[0, 100, 200]], dtype=np.uint16)
        out = min_max_normalization(img, 50, 150)
        np.testing.assert_allclose(out, [[-1.0, 0.0, 1.0]])

    def test_constant_image(self):
        img = np.full((4, 4), 7, dtype=np.uint16)
        out = min_max_normalization(img)
        assert np.all(np.isfinite(out))


class TestPadding:
    def test_buckets(self):
        assert pad_bucket_shape(60, 60) == (64, 64)
        assert pad_bucket_shape(64, 65) == (64, 128)
        assert pad_bucket_shape(300, 321) == (320, 512)
        with pytest.raises(ValueError):
            pad_bucket_shape(9000, 64)

    def test_pad_positions(self, rng):
        img = rng.integers(0, 100, size=(60, 70)).astype(np.uint16)
        padded, pads = zero_pad_model_input(img)
        assert padded.shape == (64, 128)
        assert pads == [4, 58]
        np.testing.assert_array_equal(padded[pads[0]:, pads[1]:], img)
        assert padded[:pads[0], :].sum() == 0

    def test_pad_stack(self, rng):
        img = rng.integers(0, 100, size=(3, 60, 70)).astype(np.uint16)
        padded, pads = zero_pad_model_input(img)
        assert padded.shape == (3, 64, 128)
        np.testing.assert_array_equal(padded[:, pads[0]:, pads[1]:], img)


class TestBorderCorrection:
    def test_drops_border_only_instances(self):
        mask = np.zeros((40, 40), dtype=np.uint16)
        mask[0:5, 0:5] = 1      # entirely in border strip -> dropped
        mask[15:25, 15:25] = 2  # interior -> kept
        mask[5:15, 5:15] = 3    # straddles -> kept (visible in FOI)
        out = border_correction(mask.copy(), border_width=10)
        assert set(np.unique(out)) == {0, 2, 3}

    def test_ids(self):
        mask = np.array([[0, 2], [5, 2]])
        np.testing.assert_array_equal(get_nucleus_ids(mask), [2, 5])


class TestProfiling:
    def test_step_timer(self):
        from microbeseg_tpu.utils.profiling import StepTimer
        t = StepTimer()
        with t.phase("train"):
            pass
        with t.phase("train"):
            pass
        with t.phase("val"):
            pass
        s = t.summary()
        assert s["train"]["count"] == 2
        assert s["val"]["count"] == 1
        assert "train" in t.report()


class TestNumLabels:
    def test_num_labels(self):
        import jax.numpy as jnp
        from microbeseg_tpu.ops.cc import num_labels
        labels = jnp.asarray([[0, 5], [9, 5]], dtype=jnp.int32)
        assert int(num_labels(labels)) == 2


class TestRealCorpusIntegrity:
    """Guard the committed real-microscopy corpus (data/real_glutamicum):
    the quantitative real-data rows in docs/E2E_RESULTS.md depend on it."""

    def test_corpus_complete_and_wellformed(self):
        from pathlib import Path

        import numpy as np

        from microbeseg_tpu.utils.tiff import imread_page

        corpus = Path(__file__).resolve().parents[1] / "data" / "real_glutamicum"
        imgs = sorted(corpus.glob("img_*.tif"))
        masks = sorted(corpus.glob("mask_*.tif"))
        assert len(imgs) == 50 and len(masks) == 50
        # spot-check shape/dtype/instance monotonicity (colony growth)
        counts = []
        for i in (0, 25, 49):
            img = imread_page(corpus / f"img_{i:02d}.tif", 0)
            mask = imread_page(corpus / f"mask_{i:02d}.tif", 0)
            assert img.shape == (256, 256) and img.dtype == np.uint16
            assert mask.shape == (256, 256) and mask.dtype == np.uint16
            ids = np.unique(mask)
            assert ids[0] == 0 and len(ids) >= 2
            # dense ids 1..n (the eval contingency builders rely on this
            # being a valid label image, not on density — but density
            # catches rasterizer regressions cheaply)
            counts.append(int(mask.max()))
        assert counts[0] < counts[1] < counts[2]
        assert counts[0] >= 5 and counts[2] >= 150
