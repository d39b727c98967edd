"""CLI contract tests (reference entry points: infer_script.py etc.)."""

import json

import numpy as np
import pytest

from microbeseg_tpu.cli import infer_store
from microbeseg_tpu.client.store import LocalStore
from microbeseg_tpu.utils.tiff import imread


class DummyEngine:
    def segment(self, frames):
        m = np.zeros(frames.shape, np.uint16)
        m[..., 4:10, 4:10] = 1
        return m


@pytest.fixture
def patched_engine(monkeypatch, tmp_path):
    # dummy checkpoint pair for the CLI's upfront existence check
    # (reference infer_script.py:57-62); from_checkpoint is patched and
    # never reads them
    (tmp_path / "m01.ckpt").touch()
    (tmp_path / "m01.json").touch()
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(infer_store.InferenceEngine, "from_checkpoint",
                        classmethod(lambda cls, path, cfg=None: DummyEngine()))


class TestInferStoreCLI:
    def _seed_store(self, root, rng, project_id=3):
        store = LocalStore(root)
        d1 = store.create_dataset("expA", project_id=project_id)
        d2 = store.create_dataset("expB", project_id=project_id)
        ids = []
        for did in (d1, d2):
            ids.append(store.upload_image(
                did, f"im{did}.tif",
                rng.integers(0, 99, (2, 16, 16)).astype(np.uint16)))
        return store, (d1, d2), ids

    def test_project_expansion(self, tmp_path, rng, patched_engine):
        # reference infer_script.py:79-85: project ids expand to all images
        store, _, ids = self._seed_store(tmp_path / "st", rng)
        rc = infer_store.main([
            "--local_store", str(tmp_path / "st"), "--project", "3",
            "--model", "m01", "--result_path", str(tmp_path / "out")])
        assert rc == 0
        for iid in ids:
            assert store.get_map_annotation(iid)["inference_model"] == "m01"
        masks = sorted((tmp_path / "out").glob("mask_*_channel0.tif"))
        assert len(masks) == 2
        assert imread(masks[0]).max() == 1

    def test_group_consistency_check(self, tmp_path, rng, patched_engine):
        # reference infer_script.py:106-108
        store, _, ids = self._seed_store(tmp_path / "st", rng)
        meta_path = (tmp_path / "st" / "images" / str(ids[1]) / "meta.json")
        meta = json.loads(meta_path.read_text())
        meta["group"] = 7
        meta_path.write_text(json.dumps(meta))
        with pytest.raises(ValueError, match="same group"):
            infer_store.main([
                "--local_store", str(tmp_path / "st"), "--project", "3",
                "--model", "m01"])

    def test_group_check_probes_once_per_container(self, tmp_path, rng,
                                                   patched_engine,
                                                   monkeypatch):
        """One group probe per expanded dataset (+ each explicit file), not
        one server round-trip per image (images of an OMERO dataset share
        its permission group)."""
        store_root = tmp_path / "st"
        store, _, ids = self._seed_store(store_root, rng)
        calls = []
        orig = LocalStore.image_group

        def counting(self, iid):
            calls.append(iid)
            return orig(self, iid)

        monkeypatch.setattr(LocalStore, "image_group", counting)
        rc = infer_store.main([
            "--local_store", str(store_root), "--project", "3",
            "--model", "m01", "--result_path", str(tmp_path / "out")])
        assert rc == 0
        # 2 datasets expanded -> exactly 2 probes regardless of image count
        assert len(calls) == 2

    def test_channel_flag_is_honored(self, tmp_path, rng, patched_engine):
        store = LocalStore(tmp_path / "st")
        did = store.create_dataset("d")
        store.upload_image(did, "mc.tif",
                           rng.integers(0, 99, (1, 2, 16, 16)).astype(np.uint16))
        rc = infer_store.main([
            "--local_store", str(tmp_path / "st"), "--dataset", str(did),
            "--model", "m01", "--channel", "1",
            "--result_path", str(tmp_path / "out"), "--no-upload"])
        assert rc == 0
        assert (tmp_path / "out" / "mask_mc_channel1.tif").exists()

    def test_no_files_found(self, tmp_path, rng, patched_engine, capsys):
        LocalStore(tmp_path / "st")
        rc = infer_store.main([
            "--local_store", str(tmp_path / "st"), "--model", "m01"])
        assert rc == 0
        assert "No files found" in capsys.readouterr().out

    def test_reference_omero_ids_interface(self, tmp_path, rng,
                                           patched_engine):
        """Drop-in reference flags (infer_script.py:16-18): --omero_ids N...
        --id_type project|dataset|file map onto the native selection."""
        store, (d1, d2), ids = self._seed_store(tmp_path / "st", rng)
        rc = infer_store.main([
            "--local_store", str(tmp_path / "st"),
            "--omero_ids", "3", "--id_type", "project",
            "--model", "m01", "--result_path", str(tmp_path / "o1")])
        assert rc == 0
        assert len(sorted((tmp_path / "o1").glob("mask_*"))) == 2

        rc = infer_store.main([
            "--local_store", str(tmp_path / "st"),
            "--omero_ids", str(d1), str(d2), "--id_type", "dataset",
            "--model", "m01", "--overwrite",
            "--result_path", str(tmp_path / "o2")])
        assert rc == 0
        assert len(sorted((tmp_path / "o2").glob("mask_*"))) == 2

        rc = infer_store.main([
            "--local_store", str(tmp_path / "st"),
            "--omero_ids", str(ids[0]), "--id_type", "file",
            "--model", "m01", "--overwrite",
            "--result_path", str(tmp_path / "o3")])
        assert rc == 0
        assert len(sorted((tmp_path / "o3").glob("mask_*"))) == 1

        with pytest.raises(ValueError, match="id_type"):
            infer_store.main([
                "--local_store", str(tmp_path / "st"),
                "--omero_ids", "3", "--model", "m01"])


class TestDispatchShape:
    def test_4d_rgb_stack_is_channel_last(self):
        """imread stacks multi-frame RGB pages channel-LAST (T,H,W,3);
        the reference's img[:, channel] assumed (T,C,H,W) hyperstacks and
        silently dropped the H axis."""
        from microbeseg_tpu.cli.infer_local import dispatch_shape

        img = np.zeros((5, 32, 48, 3), np.uint16)
        out = dispatch_shape(img, channel=1)
        assert out.shape == (5, 32, 48)

    def test_3d_variants(self):
        from microbeseg_tpu.cli.infer_local import dispatch_shape

        assert dispatch_shape(np.zeros((32, 48)), 0).shape == (1, 32, 48)
        assert dispatch_shape(np.zeros((32, 48, 3)), 2).shape == (1, 32, 48)
        assert dispatch_shape(np.zeros((3, 32, 48)), 1).shape == (1, 32, 48)
        assert dispatch_shape(np.zeros((5, 32, 48)), 0).shape == (5, 32, 48)


class TestImwriteRgbGuard:
    def test_non_uint8_rgb_raises(self, tmp_path):
        """A float (H,W,3) array must not silently dispatch into the
        grayscale-stack branch as H frames of (W,3)."""
        from microbeseg_tpu.utils.tiff import imwrite

        with pytest.raises(ValueError, match="RGB"):
            imwrite(tmp_path / "x.tif", np.zeros((16, 16, 3), np.float32))


class TestEvaluateCLI:
    """Threshold-grid flags on the headless eval CLI (the grid is the
    quality lever for rod/chain morphology, docs/E2E_RESULTS.md)."""

    def _run(self, monkeypatch, tmp_path, extra):
        import pandas as pd

        from microbeseg_tpu.cli import evaluate as eval_cli

        captured = {}

        class FakeEvaluator:
            def __init__(self, cfg, text_output=print):
                captured["cfg"] = cfg

            def evaluate(self, data, results, models):
                captured["models"] = models
                return pd.DataFrame({"model": [str(m) for m in models]})

        monkeypatch.setattr(eval_cli, "Evaluator", FakeEvaluator)
        rc = eval_cli.main(["--data", str(tmp_path), "--models", "m1",
                            "--results", str(tmp_path / "r")] + extra)
        assert rc == 0
        return captured["cfg"]

    def test_default_grid_is_reference(self, monkeypatch, tmp_path):
        cfg = self._run(monkeypatch, tmp_path, [])
        assert cfg.th_cells == (0.05, 0.075, 0.10, 0.125)  # eval.py:128
        assert cfg.th_seeds == (0.35, 0.45)

    def test_grid_flags_override(self, monkeypatch, tmp_path):
        cfg = self._run(monkeypatch, tmp_path,
                        ["--th_seeds", "0.45", "0.65", "0.75",
                         "--th_cells", "0.1"])
        assert cfg.th_seeds == (0.45, 0.65, 0.75)
        assert cfg.th_cells == (0.1,)
