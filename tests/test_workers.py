"""Training-worker tests: label creation, OOM ladder, cancellation."""

import numpy as np
import pytest

from microbeseg_tpu.training import workers
from microbeseg_tpu.utils.tiff import imread, imwrite
from tests.conftest import synthetic_blobs


def _make_trainset(tmp_path, rng, n_train=3, n_val=2, size=48):
    root = tmp_path / "trainset"
    for split, n in (("train", n_train), ("val", n_val)):
        (root / split).mkdir(parents=True)
        for i in range(n):
            mask = synthetic_blobs(rng, shape=(size, size), n_blobs=3)
            img = ((mask > 0) * 40000 + 5000).astype(np.uint16)
            imwrite(root / split / f"img_{split}{i}.tif", img)
            imwrite(root / split / f"mask_{split}{i}.tif", mask)
    return root


class TestCreateLabels:
    def test_distance_labels_written(self, tmp_path, rng):
        root = _make_trainset(tmp_path, rng)
        assert workers.create_labels(root, "distance")
        cd = sorted((root / "train").glob("cell_dist_*.tif"))
        nd = sorted((root / "train").glob("neighbor_dist_*.tif"))
        assert len(cd) == 3 and len(nd) == 3
        lbl = imread(cd[0])
        assert lbl.dtype == np.float32
        assert 0 <= lbl.min() and lbl.max() <= 1.0 + 1e-5

    def test_boundary_labels_written(self, tmp_path, rng):
        root = _make_trainset(tmp_path, rng)
        assert workers.create_labels(root, "boundary")
        b = sorted((root / "train").glob("boundary_*.tif"))
        assert len(b) == 3
        assert set(np.unique(imread(b[0]))) <= {0, 1, 2}

    def test_cell_dist_labels_nonzero(self, tmp_path, rng):
        """cell_dist/cell_dist_clipped need the measured major axis too:
        max_mal=0 shrinks the EDT window to nothing and silently writes
        all-zero labels (regression: the measurement was 'distance'-only)."""
        root = _make_trainset(tmp_path, rng)
        assert workers.create_labels(root, "cell_dist")
        for f in sorted((root / "train").glob("cell_dist_*.tif")):
            lbl = imread(f)
            assert lbl.max() > 0.5

    def test_too_few_masks(self, tmp_path, rng):
        root = _make_trainset(tmp_path, rng, n_train=1, n_val=1)
        assert not workers.create_labels(root, "distance")

    def test_cancellation(self, tmp_path, rng):
        root = _make_trainset(tmp_path, rng)
        assert not workers.create_labels(root, "distance",
                                         should_stop=lambda: True)


class TestOOMLadder:
    def test_ladder_descends_and_gives_up(self, tmp_path, rng, monkeypatch):
        root = _make_trainset(tmp_path, rng)
        workers.create_labels(root, "distance")
        seen = []

        class FakeTrainer:
            stopped = False

            def __init__(self, cfg, path_models, **kw):
                seen.append((cfg.batch_size, cfg.model.filters))

            def fit(self, data, print_output=False, resume=False, **kw):
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

        monkeypatch.setattr(workers, "Trainer", FakeTrainer)
        ok = workers.run_training(root, tmp_path / "models", "distance",
                                  iterations=1, optimizer="adam",
                                  batch_size=16)
        assert ok is False
        # 16 -> 8 -> 4 -> filters (32,512) -> (32,256) -> give up
        assert seen == [(16, (64, 1024)), (8, (64, 1024)), (4, (64, 1024)),
                        (4, (32, 512)), (4, (32, 256))]

    def test_non_oom_errors_propagate(self, tmp_path, rng, monkeypatch):
        root = _make_trainset(tmp_path, rng)
        workers.create_labels(root, "distance")

        class FakeTrainer:
            stopped = False

            def __init__(self, cfg, path_models, **kw):
                pass

            def fit(self, data, print_output=False, resume=False, **kw):
                raise ValueError("some bug")

        monkeypatch.setattr(workers, "Trainer", FakeTrainer)
        with pytest.raises(ValueError):
            workers.run_training(root, tmp_path / "models", "distance",
                                 iterations=1, optimizer="adam", batch_size=4)
