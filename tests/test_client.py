"""Client-layer tests: contours, LocalStore, and the data-management workers
against the store fake (SURVEY.md §4(e))."""

import numpy as np
import pandas as pd
import pytest
from scipy import ndimage

from microbeseg_tpu.client.contours import (
    get_indices_pandas,
    mask_to_polygons,
    polygon_to_mask,
    roi_string_to_polygon,
    trace_boundary,
)
from microbeseg_tpu.client.store import LocalStore, RoiPolygon
from microbeseg_tpu.client.workers import (
    CropGenerator,
    _mask_to_rois,
    _rasterize_rois,
    analyze_dataset,
    export_results,
    export_trainset,
    import_data,
    infer_dataset,
    split_assignment,
)
from microbeseg_tpu.utils.tiff import imread, imwrite
from tests.conftest import synthetic_blobs


class TestContours:
    def _python_polygons(self, mask, monkeypatch):
        """mask_to_polygons forced down the per-instance Python loop."""
        import microbeseg_tpu.client.native as native
        monkeypatch.setattr(native, "trace_all_native", lambda labels: None)
        return mask_to_polygons(mask)

    def test_batched_native_trace_matches_python_loop(self, rng, monkeypatch):
        from tests.conftest import synthetic_blobs
        mask = synthetic_blobs(rng, shape=(96, 96), n_blobs=12)
        # add a multi-fragment instance and an isolated pixel
        mid = int(mask.max())
        mask[2:5, 2:5] = mid + 1
        mask[2:5, 90:93] = mid + 1
        mask[94, 94] = mid + 2
        expected = self._python_polygons(mask.copy(), monkeypatch)
        monkeypatch.undo()
        got = mask_to_polygons(mask)
        assert list(got.keys()) == list(expected.keys())
        for k in expected:
            assert len(got[k]) == len(expected[k])
            for a, b in zip(got[k], expected[k]):
                np.testing.assert_array_equal(a, b)

    def test_mask_to_roi_strings_matches_join(self, rng, monkeypatch):
        from microbeseg_tpu.client.contours import (
            mask_to_roi_strings,
            polygons_to_roi_strings,
        )
        from tests.conftest import synthetic_blobs
        mask = synthetic_blobs(rng, shape=(80, 80), n_blobs=9)
        expected = polygons_to_roi_strings(
            self._python_polygons(mask.copy(), monkeypatch))
        monkeypatch.undo()
        assert mask_to_roi_strings(mask) == expected

    def test_batched_trace_annulus_outer_only(self):
        # instances with holes: default path returns only the covering
        # outer contour (reference covers-semantics) on both paths
        yy, xx = np.mgrid[0:40, 0:40]
        r2 = (yy - 20) ** 2 + (xx - 20) ** 2
        ann = ((r2 <= 220) & (r2 >= 60)).astype(np.uint16)
        polys = mask_to_polygons(ann)
        assert len(polys[1]) == 1  # one outer contour, no hole contour

    def test_multi_fragment_instance(self):
        # one id split into two disconnected fragments -> two contours
        m = np.zeros((20, 20), np.uint16)
        m[2:6, 2:6] = 1
        m[12:16, 12:16] = 1
        polys = mask_to_polygons(m)
        assert len(polys[1]) == 2


    def test_disk_roundtrip(self):
        yy, xx = np.mgrid[0:30, 0:30]
        disk = (yy - 15) ** 2 + (xx - 15) ** 2 <= 64
        polys = mask_to_polygons(disk.astype(np.uint16))
        m = polygon_to_mask(polys[1][0], disk.shape)
        iou = (m & disk).sum() / (m | disk).sum()
        assert iou > 0.98

    def test_contour_on_boundary(self):
        L = np.zeros((10, 10), bool)
        L[2:8, 2:4] = True
        L[6:8, 2:8] = True
        c = trace_boundary(L)
        b = L & ~ndimage.binary_erosion(L)
        assert len(c) == b.sum()
        assert all(b[y, x] for y, x in c)

    def test_multi_instance_roundtrip(self, blobs):
        polys = mask_to_polygons(blobs)
        assert len(polys) == len(np.unique(blobs)) - 1
        recon = np.zeros_like(blobs)
        for inst_id, contours in polys.items():
            for poly in contours:
                recon[polygon_to_mask(poly, blobs.shape)] = inst_id
        agree = (recon > 0) == (blobs > 0)
        assert agree.mean() > 0.97

    def test_annulus_hole_matches_reference_covers_semantics(self):
        """Reference hull_polygon.py:51-89: when findContours returns a hole
        hierarchy, the covers() check selects and returns ONLY the outer
        contour — holes are dropped from the polygon representation.  Our
        outer-boundary Moore tracing produces the same result by
        construction: one contour whose rasterization fills the hole."""
        yy, xx = np.mgrid[0:40, 0:40]
        r2 = (yy - 20) ** 2 + (xx - 20) ** 2
        annulus = ((r2 <= 225) & (r2 >= 36)).astype(np.uint16)
        polys = mask_to_polygons(annulus)
        assert len(polys[1]) == 1  # outer contour only (reference :74-79)
        rec = polygon_to_mask(polys[1][0], annulus.shape)
        disk = r2 <= 225
        assert not (rec & ~disk).any()      # stays inside the outer circle
        assert not (disk & ~rec).any()      # hole is filled, like the
        #                                     reference's outer-only polygon

    def test_annulus_hole_tracing_and_covers(self):
        """Hole contours are traced (reference findContours RETR_TREE child
        contours) and the covers test identifies the covering outer shape
        (reference hull_polygon.py:62-80); include_holes=True exposes them."""
        from microbeseg_tpu.client.contours import polygon_covers, trace_holes

        yy, xx = np.mgrid[0:40, 0:40]
        r2 = (yy - 20) ** 2 + (xx - 20) ** 2
        annulus = (r2 <= 225) & (r2 >= 36)
        holes = trace_holes(annulus)
        assert len(holes) == 1
        # every hole pixel lies strictly inside the inner circle
        assert all(r2[y, x] < 36 for y, x in holes[0])

        outer = trace_boundary(annulus)[:, ::-1]
        assert polygon_covers(outer, holes[0][:, ::-1])
        assert not polygon_covers(holes[0][:, ::-1], outer)

        polys = mask_to_polygons(annulus.astype(np.uint16),
                                 include_holes=True)
        assert len(polys[1]) == 2  # outer + hole contour
        # the ROI path (default) still gets only the covering outer contour
        assert len(mask_to_polygons(annulus.astype(np.uint16))[1]) == 1

    def test_solid_object_has_no_holes(self):
        from microbeseg_tpu.client.contours import trace_holes

        m = np.zeros((12, 12), bool)
        m[3:9, 3:9] = True
        assert trace_holes(m) == []

    def test_roi_string_roundtrip(self):
        poly = np.array([[1, 2], [3, 4], [5, 6]])
        s = " ".join(f"{x},{y}" for x, y in poly)
        np.testing.assert_allclose(roi_string_to_polygon(s), poly)

    def test_roi_string_extra_fields_take_slow_path(self):
        """Tokens like 'x,y,z' must NOT hit the fast whole-string reshape
        (an even total token count would silently scramble pairs): the
        defensive parser takes x,y per token."""
        s = "1,2,9 3,4,9"
        np.testing.assert_allclose(roi_string_to_polygon(s),
                                   [[1, 2], [3, 4]])

    def test_roi_string_mixed_arity_raises(self):
        """'1,2,3 4' balances the total subtoken count (4 == 2 points x 2)
        but is malformed; the fast path must not reshape it into scrambled
        pairs — the defensive parser surfaces the corrupt ROI instead."""
        with pytest.raises(ValueError):
            roi_string_to_polygon("1,2,3 4")

    def test_indices(self):
        m = np.array([[0, 2], [2, 3]])
        idx = get_indices_pandas(m)
        assert set(idx.keys()) == {2, 3}
        ys, xs = idx[2]
        assert sorted(zip(ys.tolist(), xs.tolist())) == [(0, 1), (1, 0)]


@pytest.fixture(params=["local", "omero"])
def any_store(request, tmp_path):
    """The full ImageStore contract is exercised against BOTH backends:
    LocalStore (filesystem) and the REAL OmeroStore running on the fake
    in-memory gateway (tests/fake_omero.py; SURVEY.md §4(e))."""
    if request.param == "local":
        yield LocalStore(tmp_path / "store"), None
    else:
        from microbeseg_tpu.client.store import OmeroStore
        from tests import fake_omero
        server = fake_omero.install()
        yield OmeroStore("user", "pw", "fake.host", 4064), server


class TestStoreContract:
    def test_image_roundtrip(self, any_store, rng):
        store, _ = any_store
        did = store.create_dataset("experiment1")
        assert store.dataset_name(did) == "experiment1"
        stack = rng.integers(0, 65535, (3, 20, 25)).astype(np.uint16)
        iid = store.upload_image(did, "stack.tif", stack)
        ref = store.get_image(iid)
        assert (ref.size_t, ref.size_c, ref.size_y, ref.size_x) == (3, 1, 20, 25)
        np.testing.assert_array_equal(store.get_plane(iid, 0, 0, 1), stack[1])
        assert store.list_images(did)[0].image_id == iid

    def test_multichannel_roundtrip(self, any_store, rng):
        store, _ = any_store
        did = store.create_dataset("mc")
        stack = rng.integers(0, 65535, (2, 3, 12, 10)).astype(np.uint16)
        iid = store.upload_image(did, "mc.tif", stack)
        ref = store.get_image(iid)
        assert (ref.size_t, ref.size_c) == (2, 3)
        for t in range(2):
            for c in range(3):
                np.testing.assert_array_equal(
                    store.get_plane(iid, 0, c, t), stack[t, c])

    def test_annotations_and_rois(self, any_store):
        store, _ = any_store
        did = store.create_dataset("d")
        iid = store.upload_image(did, "x.tif", np.zeros((5, 5), np.uint16))
        store.set_map_annotation(iid, {"set": "train", "min_frame": 3})
        assert store.get_map_annotation(iid)["set"] == "train"
        # merge semantics: a second write keeps untouched keys
        store.set_map_annotation(iid, {"inference_model": "m01"})
        meta = store.get_map_annotation(iid)
        assert meta["set"] == "train" and meta["inference_model"] == "m01"
        store.add_polygons(iid, [RoiPolygon(t=0, z=0, points="1,1 3,1 3,3")])
        assert len(store.get_polygons(iid)) == 1
        assert store.get_polygons(iid)[0].points == "1,1 3,1 3,3"
        store.delete_polygons(iid)
        assert store.get_polygons(iid) == []

    def test_attachments(self, any_store, tmp_path):
        store, _ = any_store
        did = store.create_dataset("d")
        iid = store.upload_image(did, "x.tif", np.zeros((5, 5), np.uint16))
        f = tmp_path / "a.csv"
        f.write_text("x\n1\n")
        store.attach_file(iid, f, namespace="ns1")
        assert store.list_attachments(iid, namespace="ns1") == ["a.csv"]
        out = store.download_attachment(iid, "a.csv", tmp_path / "b.csv")
        assert out.read_text() == "x\n1\n"
        assert store.download_attachment(iid, "nope.csv", tmp_path / "c") is None
        store.delete_attachments(iid, namespace="ns1")
        assert store.list_attachments(iid) == []

    def test_dataset_map_annotation(self, any_store):
        """Dataset-level key-value pairs (reference keeps crop_size on the
        trainset dataset, microbe_seg_gui.py:1976-1981/2172-2185)."""
        store, _ = any_store
        did = store.create_dataset("trainset")
        assert store.get_dataset_map_annotation(did) == {}
        store.set_dataset_map_annotation(did, {"crop_size": 256})
        assert store.get_dataset_map_annotation(did)["crop_size"] == "256"
        # merge semantics like image-level annotations
        store.set_dataset_map_annotation(did, {"other": "x"})
        meta = store.get_dataset_map_annotation(did)
        assert meta["crop_size"] == "256" and meta["other"] == "x"

    def test_dataset_attachments(self, any_store, tmp_path):
        """Dataset-level file annotations (split_info.json lives on the
        trainset, reference gui:2188-2206/2782-2796)."""
        store, _ = any_store
        did = store.create_dataset("trainset")
        f = tmp_path / "split_info.json"
        f.write_text('{"used": [], "num_acc": 0}')
        store.attach_dataset_file(did, f, namespace="split.info.namespace")
        assert store.list_dataset_attachments(
            did, namespace="split.info.namespace") == ["split_info.json"]
        out = store.download_dataset_attachment(
            did, "split_info.json", tmp_path / "dl.json")
        assert '"num_acc": 0' in out.read_text()
        assert store.download_dataset_attachment(
            did, "nope.json", tmp_path / "x") is None
        # replace-on-save: delete by namespace, re-attach
        store.delete_dataset_attachments(did,
                                         namespace="split.info.namespace")
        assert store.list_dataset_attachments(did) == []

    def test_projects_and_groups(self, any_store):
        store, server = any_store
        if server is None:
            pid = store.create_project("proj")
        else:
            pid = server.create_project("proj")
        d1 = store.create_dataset("a", project_id=pid)
        d2 = store.create_dataset("b", project_id=pid)
        store.create_dataset("other")
        assert store.list_datasets(pid) == [d1, d2]
        # named project browsing (reference gui:1658-1797)
        assert (pid, "proj") in store.list_projects()
        iid = store.upload_image(d1, "x.tif", np.zeros((4, 4), np.uint16))
        assert store.image_group(iid) == 0


class TestOmeroStoreSpecific:
    """Behaviors only the gateway-backed store has."""

    def _store(self):
        from microbeseg_tpu.client.store import OmeroStore
        from tests import fake_omero
        server = fake_omero.install()
        return OmeroStore("u", "p", "h", 4064), server

    def test_refused_connection(self):
        from tests import fake_omero
        server = fake_omero.install()
        server.refuse_connect = True
        from microbeseg_tpu.client.store import OmeroStore
        with pytest.raises(ConnectionError, match="No OMERO connection"):
            OmeroStore("u", "p", "h", 4064)

    def test_reconnect_retry(self, rng):
        # reference infer.py:138-143: timeout -> disconnect/reconnect -> retry
        store, server = self._store()
        did = store.create_dataset("d")
        stack = rng.integers(0, 99, (2, 8, 8)).astype(np.uint16)
        iid = store.upload_image(did, "x.tif", stack)
        assert server.connects == 1
        server.kill_connections()
        ref = store.get_image(iid)  # first attempt raises -> reconnect -> ok
        assert ref.size_t == 2
        assert server.connects == 2
        np.testing.assert_array_equal(store.get_plane(iid, 0, 0, 1), stack[1])

    def test_group_survives_reconnect(self, rng):
        """set_group's scope must be re-applied by _connect: a transient
        gateway error used to silently reset browsing to all groups."""
        store, server = self._store()
        store.set_group(5)
        assert store._conn.group_set[-1] == "5"
        server.kill_connections()
        store.list_groups()  # read: raises -> reconnect -> retried
        assert server.connects == 2
        assert store._conn.group_set[-1] == "5"

    def test_mutators_heal_but_do_not_retry(self, rng):
        """Non-idempotent mutators re-raise after reconnecting: a blind
        retry after a mid-call drop would duplicate server-side state."""
        store, server = self._store()
        did = store.create_dataset("d")
        server.kill_connections()
        with pytest.raises(Exception):
            store.upload_image(did, "x.tif", np.zeros((4, 4), np.uint16))
        assert server.connects == 2  # connection healed...
        iid = store.upload_image(did, "x.tif", np.zeros((4, 4), np.uint16))
        # ...and exactly ONE image exists (no hidden duplicate upload)
        assert [r.image_id for r in store.list_images(did)] == [iid]

    def test_group_consistency_data(self, rng):
        store, server = self._store()
        did = store.create_dataset("d")
        i1 = store.upload_image(did, "a.tif", np.zeros((4, 4), np.uint16))
        i2 = store.upload_image(did, "b.tif", np.zeros((4, 4), np.uint16))
        server.set_group(i2, 5)
        assert store.image_group(i1) != store.image_group(i2)

    def test_close(self):
        store, server = self._store()
        store.close()
        assert not server.live_gateways or not server.live_gateways[0]._alive


class TestWorkersRoundtrip:
    """Every worker runs against BOTH backends via the any_store fixture
    (VERDICT round-1 item 2)."""

    def _store_with_trainset(self, store, tmp_path, rng, n=6):
        did = store.create_dataset("trainset320")
        img_paths, mask_paths = [], []
        src = tmp_path / "src"
        src.mkdir()
        for i in range(n):
            mask = synthetic_blobs(rng, shape=(48, 48), n_blobs=4)
            img = ((mask > 0) * 30000 + 2000).astype(np.uint16)
            ip, mp = src / f"im{i}.tif", src / f"ma{i}.tif"
            imwrite(ip, img)
            imwrite(mp, mask)
            img_paths.append(ip)
            mask_paths.append(mp)
        ids = import_data(store, did, img_paths, mask_paths, crop_size=48,
                          split_probs=(0.5, 0.3, 0.2), seed=1)
        return store, did, ids

    def test_import_export_roundtrip(self, any_store, tmp_path, rng):
        store, did, ids = self._store_with_trainset(any_store[0], tmp_path, rng)
        assert len(ids) == 6
        root = export_trainset(store, did, tmp_path / "export")
        assert root is not None
        imgs = list(root.glob("*/img_*.tif"))
        masks = list(root.glob("*/mask_*.tif"))
        assert len(imgs) == 6 and len(masks) == 6
        # masks rasterized from ROIs approximate the originals
        m = imread(masks[0])
        assert m.max() >= 1

    def test_analysis(self, any_store, tmp_path, rng):
        store, did, ids = self._store_with_trainset(any_store[0], tmp_path, rng, n=2)
        outs = analyze_dataset(store, ids[:1], tmp_path / "analysis")
        df = pd.read_csv(outs[0])
        assert df.iloc[0]["cell_count"] >= 1
        assert df.iloc[0]["mean_area"] > 0
        from microbeseg_tpu.client.store import ANALYSIS_NAMESPACE
        assert store.list_attachments(ids[0], namespace=ANALYSIS_NAMESPACE)

    def test_analysis_batched_matches_numpy(self, any_store, tmp_path, rng):
        """The frame-vmapped analysis path produces the same per-frame
        counts/areas as direct numpy on the rasterized masks — including a
        zero-cell frame inside a multi-frame 2D+t stack."""
        from microbeseg_tpu.client.workers import (_mask_to_rois,
                                                   _rasterize_rois)
        store = any_store[0]
        did = store.create_dataset("exp")
        frames = []
        for t in range(3):
            n = 0 if t == 1 else 3 + t  # frame 1 is empty
            frames.append(synthetic_blobs(rng, shape=(64, 64), n_blobs=n)
                          if n else np.zeros((64, 64), np.uint16))
        iid = store.upload_image(did, "stack.tif",
                                 np.stack([(f > 0).astype(np.uint16) * 20000
                                           for f in frames]))
        rois = []
        for t, f in enumerate(frames):
            rois.extend(_mask_to_rois(f, t=t))
        store.add_polygons(iid, rois)

        outs = analyze_dataset(store, [iid], tmp_path / "analysis")
        df = pd.read_csv(outs[0])
        assert len(df) == 3
        for t in range(3):
            # numpy oracle on the same rasterization the worker uses
            m = _rasterize_rois(store.get_polygons(iid), t, (64, 64))
            counts = np.bincount(m.reshape(-1))[1:]
            counts = counts[counts > 0]
            row = df.iloc[t]
            assert row["cell_count"] == len(counts)
            if len(counts):
                np.testing.assert_allclose(row["mean_area"], counts.mean(),
                                           rtol=1e-5)
                np.testing.assert_allclose(row["total_area"], counts.sum(),
                                           rtol=1e-5)
                assert row["mean_major_axis"] > 0
            else:
                assert row["total_area"] == 0.0
                assert row["mean_major_axis"] == 0.0

    def test_result_export(self, any_store, tmp_path, rng):
        store, did, ids = self._store_with_trainset(any_store[0], tmp_path, rng, n=2)
        export_results(store, ids[:1], tmp_path / "results")
        ref = store.get_image(ids[0])
        stem = ref.name.rsplit(".", 1)[0]
        out = tmp_path / "results"
        assert (out / f"{stem}.tif").exists()
        assert (out / f"{stem}_mask.tif").exists()
        assert (out / f"{stem}_overlay.tif").exists()
        assert (out / f"{stem}_outlines.tif").exists()

    def test_infer_dataset_with_dummy_engine(self, any_store, tmp_path, rng):
        store, did, ids = self._store_with_trainset(any_store[0], tmp_path, rng, n=2)
        store.delete_polygons(ids[0])
        store.set_map_annotation(ids[0], {"inference_model": ""})

        class DummyEngine:
            def segment(self, frames):
                m = np.zeros(frames.shape, np.uint16)
                m[..., 5:15, 5:15] = 1
                return m

        infer_dataset(store, ids[:1], DummyEngine(), model_name="m01",
                      result_dir=tmp_path / "masks")
        assert store.get_map_annotation(ids[0])["inference_model"] == "m01"
        assert len(store.get_polygons(ids[0])) >= 1
        assert len(list((tmp_path / "masks").glob("mask_*.tif"))) == 1

    def test_infer_duplicate_ids_deduped(self, any_store, tmp_path, rng):
        """A repeated image id (explicit --files + dataset expansion) must
        segment once: with pipeline=True the second occurrence's processed
        check / overwrite deletions could otherwise race the first's pending
        finish() and double-upload ROIs."""
        store, did, ids = self._store_with_trainset(any_store[0], tmp_path, rng, n=1)
        store.delete_polygons(ids[0])

        calls = []

        class CountingEngine:
            def segment(self, frames):
                calls.append(1)
                m = np.zeros(frames.shape, np.uint16)
                m[..., 5:15, 5:15] = 1
                return m

        infer_dataset(store, [ids[0], ids[0], ids[0]], CountingEngine(),
                      model_name="m01", overwrite=True, pipeline=True)
        assert len(calls) == 1
        # exactly one ROI set uploaded (one square instance per frame)
        n_frames = store.get_image(ids[0]).size_t
        assert len(store.get_polygons(ids[0])) == n_frames

    def test_multiframe_overlay_stack(self, tmp_path, rng):
        # reference result_export.py:183-204 writes the overlay per frame
        store = LocalStore(tmp_path / "store")
        did = store.create_dataset("d")
        stack = rng.integers(0, 65535, (3, 20, 20)).astype(np.uint16)
        iid = store.upload_image(did, "movie.tif", stack)
        store.add_polygons(iid, [RoiPolygon(t=1, z=0, points="2,2 8,2 8,8 2,8")])
        export_results(store, [iid], tmp_path / "res")
        ov = imread(tmp_path / "res" / "movie_overlay.tif")
        assert ov.shape == (3, 20, 20, 3)
        assert (ov[1] == (255, 255, 0)).all(-1).any()  # yellow outline frame
        assert not (ov[0] == (255, 255, 0)).all(-1).any()

    def test_infer_channel_and_permission_guards(self, any_store, tmp_path, rng):
        store, server = any_store
        did = store.create_dataset("d")
        mc = store.upload_image(did, "mc.tif",
                                rng.integers(0, 99, (2, 2, 16, 16)).astype(np.uint16))
        sc = store.upload_image(did, "sc.tif",
                                rng.integers(0, 99, (2, 16, 16)).astype(np.uint16))

        class DummyEngine:
            def segment(self, frames):
                m = np.zeros(frames.shape, np.uint16)
                m[..., 4:8, 4:8] = 1
                return m

        msgs = []
        # channel 1 exists on mc only -> sc skipped with the reference message
        infer_dataset(store, [mc, sc], DummyEngine(), model_name="m",
                      channel=1, result_dir=tmp_path / "r",
                      text_output=msgs.append)
        assert any("not enough channels found" in m for m in msgs)
        assert (tmp_path / "r" / "mask_mc_channel1.tif").exists()
        assert not (tmp_path / "r" / "mask_sc_channel1.tif").exists()
        assert store.get_map_annotation(mc)["inference_model"] == "m"
        # write-permission guard (only the omero backend models permissions)
        if server is not None:
            server.images[sc]["can_annotate"] = False
            msgs.clear()
            infer_dataset(store, [sc], DummyEngine(), model_name="m",
                          text_output=msgs.append)
            assert any("no write permission" in m for m in msgs)
            assert "inference_model" not in store.get_map_annotation(sc)

    def test_infer_overwrite_deletes_stale_artifacts(self, any_store, tmp_path, rng):
        # reference infer.py:186-205: overwrite removes old ROIs, analysis
        # CSVs, and label-tool attachments
        from microbeseg_tpu.client.store import ANALYSIS_NAMESPACE
        from microbeseg_tpu.client.workers import LABEL_TOOL_ATTACHMENTS
        store, _ = any_store
        did = store.create_dataset("d")
        iid = store.upload_image(did, "x.tif",
                                 rng.integers(0, 99, (1, 16, 16)).astype(np.uint16))
        store.add_polygons(iid, [RoiPolygon(t=0, z=0, points="1,1 3,1 3,3")])
        store.set_map_annotation(iid, {"inference_model": "old"})
        f1 = tmp_path / "analysis_x.csv"
        f1.write_text("a\n")
        store.attach_file(iid, f1, namespace=ANALYSIS_NAMESPACE)
        f2 = tmp_path / LABEL_TOOL_ATTACHMENTS[0]
        f2.write_text("{}")
        store.attach_file(iid, f2, namespace="labeltool")
        f3 = tmp_path / "keep.txt"
        f3.write_text("k")
        store.attach_file(iid, f3, namespace="other")

        class DummyEngine:
            def segment(self, frames):
                m = np.zeros(frames.shape, np.uint16)
                m[..., 2:6, 2:6] = 1
                return m

        # without overwrite: skipped
        msgs = []
        infer_dataset(store, [iid], DummyEngine(), model_name="new",
                      text_output=msgs.append)
        assert any("already processed" in m for m in msgs)
        assert store.get_map_annotation(iid)["inference_model"] == "old"
        # with overwrite: stale ROIs + attachments removed, new results in
        infer_dataset(store, [iid], DummyEngine(), model_name="new",
                      overwrite=True)
        assert store.get_map_annotation(iid)["inference_model"] == "new"
        names = store.list_attachments(iid)
        assert "analysis_x.csv" not in names
        assert LABEL_TOOL_ATTACHMENTS[0] not in names
        assert "keep.txt" in names
        polys = store.get_polygons(iid)
        assert len(polys) == 1  # old ROI replaced by the new square

    def test_infer_pipelined_matches_serial(self, any_store, tmp_path, rng):
        """pipeline=True (helper-thread result handling) must leave the store
        and the mask files bit-identical to the serial path."""
        store, _ = any_store

        class DummyEngine:
            def segment(self, frames):
                m = np.zeros(frames.shape, np.uint16)
                m[..., 5:15, 5:15] = 1
                m[..., 20:30, 18:26] = 2
                return m

        results = {}
        for mode in ("serial", "piped"):
            rng2 = np.random.default_rng(7)
            (tmp_path / mode).mkdir(exist_ok=True)
            _, did, ids = self._store_with_trainset(store, tmp_path / mode,
                                                    rng2, n=3)
            for iid in ids:
                store.delete_polygons(iid)
                store.set_map_annotation(iid, {"inference_model": ""})
            out = tmp_path / f"masks_{mode}"
            infer_dataset(store, ids, DummyEngine(), model_name="m01",
                          result_dir=out, pipeline=(mode == "piped"))
            results[mode] = {
                "polys": [[(p.t, p.z, p.points) for p in
                           store.get_polygons(i)] for i in ids],
                "model": [store.get_map_annotation(i)["inference_model"]
                          for i in ids],
                "masks": sorted((f.name, f.read_bytes())
                                for f in out.glob("mask_*.tif")),
            }
        assert results["serial"] == results["piped"]

    def test_infer_pipeline_overlaps_host_and_device(self, tmp_path, rng,
                                                     monkeypatch):
        """While the helper thread handles image 0's results (here: the mask
        write, which runs without the store lock), the main thread must
        already be running image 1's segment — coordinated via events so a
        serialized implementation fails (times out) deterministically."""
        import threading

        import microbeseg_tpu.client.workers as wk

        store = LocalStore(tmp_path / "store")
        did = store.create_dataset("d")
        ids = [store.upload_image(did, f"im{i}.tif",
                                  rng.integers(0, 99, (16, 16))
                                  .astype(np.uint16)) for i in range(2)]
        second_segment_started = threading.Event()
        overlapped = []
        real_imwrite = wk.imwrite

        def blocking_imwrite(path, arr):
            # image 0's mask write waits until image 1's segment has started
            overlapped.append(second_segment_started.wait(timeout=30))
            return real_imwrite(path, arr)

        monkeypatch.setattr(wk, "imwrite", blocking_imwrite)

        class DummyEngine:
            calls = 0

            def segment(self, frames):
                DummyEngine.calls += 1
                if DummyEngine.calls >= 2:
                    second_segment_started.set()
                m = np.zeros(frames.shape, np.uint16)
                m[..., 4:8, 4:8] = 1
                return m

        infer_dataset(store, ids, DummyEngine(), model_name="m",
                      upload=False, result_dir=tmp_path / "masks",
                      pipeline=True)
        assert overlapped and overlapped[0]  # image 0's write saw the overlap
        assert len(list((tmp_path / "masks").glob("mask_*.tif"))) == 2

    def test_infer_pipeline_propagates_helper_errors(self, tmp_path, rng):
        store = LocalStore(tmp_path / "store")
        did = store.create_dataset("d")
        ids = [store.upload_image(did, f"im{i}.tif",
                                  rng.integers(0, 99, (16, 16))
                                  .astype(np.uint16)) for i in range(3)]

        def broken_add(iid, rois):
            raise RuntimeError("upload failed")

        store.add_polygons = broken_add

        class DummyEngine:
            def segment(self, frames):
                m = np.zeros(frames.shape, np.uint16)
                m[..., 4:8, 4:8] = 1
                return m

        with pytest.raises(RuntimeError, match="upload failed"):
            infer_dataset(store, ids, DummyEngine(), model_name="m",
                          pipeline=True)

    def test_rasterize_mask_rois_roundtrip(self, rng):
        mask = synthetic_blobs(rng, shape=(40, 40), n_blobs=3)
        rois = _mask_to_rois(mask)
        back = _rasterize_rois(rois, 0, mask.shape)
        agree = (back > 0) == (mask > 0)
        assert agree.mean() > 0.97


class TestCropGenerator:
    def test_crop_list_and_crops(self, tmp_path, rng):
        store = LocalStore(tmp_path)
        did = store.create_dataset("exp")
        stack = rng.integers(0, 65535, (10, 96, 200)).astype(np.uint16)
        iid = store.upload_image(did, "movie.tif", stack)
        gen = CropGenerator(store, crop_size=64, seed=0)
        items = gen.crop_list(did)
        # reference frame stride: 0.4*10 <= 30 -> every 2nd frame
        # (microbe_seg_gui.py:2248-2251)
        assert sorted(t for _, t in items) == [0, 2, 4, 6, 8]
        crops = gen.next_crops(*items[0])
        assert len(crops) == 3  # 200 > 3*64
        assert crops[0].img.shape == (64, 64)
        tid = store.create_dataset("trainset")
        cid = gen.upload_crop(crops[0], tid, split_assignment(0))
        assert store.get_map_annotation(cid)["set"] == "train"
        # crop named by the accepted-crop counter (reference gui:2726)
        assert store.get_image(cid).name == "img_000.tif"

    def test_frame_cap_stride_large_experiment(self, tmp_path, rng):
        """Experiments beyond the 30-frame cap stride at ceil(size_t/30)
        so at most ~30 frames are offered (reference gui:2248-2251)."""
        store = LocalStore(tmp_path)
        did = store.create_dataset("exp")
        stack = rng.integers(0, 65535, (80, 96, 96)).astype(np.uint16)
        store.upload_image(did, "long.tif", stack)
        gen = CropGenerator(store, crop_size=64, seed=0)
        items = gen.crop_list(did)
        # 0.4*80 = 32 > 30 -> stride ceil(80/30) = 3 -> 27 frames
        assert len(items) == 27
        assert sorted(t for _, t in items)[:3] == [0, 3, 6]

    def test_upload_crop_records_frame_once(self, tmp_path, rng):
        """Accepting several crops of one frame (keys 1/2/3) appends the
        [id, frame, channel] triple to split_info['used'] only once."""
        store = LocalStore(tmp_path)
        did = store.create_dataset("exp")
        stack = rng.integers(0, 65535, (1, 96, 200)).astype(np.uint16)
        store.upload_image(did, "movie.tif", stack)
        gen = CropGenerator(store, crop_size=64, seed=0)
        crops = gen.next_crops(*gen.crop_list(did)[0])
        assert len(crops) == 3
        tid = store.create_dataset("trainset")
        for i, crop in enumerate(crops):
            gen.upload_crop(crop, tid, split_assignment(i))
        assert gen.split_info["num_acc"] == 3
        assert len(gen.split_info["used"]) == 1

    def test_split_assignment_pattern(self):
        # reference microbe_seg_gui.py:2848-2865: fixed first-8 order, then
        # a 6-cycle (14 crops: 8/3/3, 20: 12/4/4, ...)
        first8 = [split_assignment(i) for i in range(8)]
        assert first8 == ["train", "train", "val", "test",
                          "train", "train", "val", "test"]
        next6 = [split_assignment(i) for i in range(8, 14)]
        assert next6 == ["train", "train", "val", "train", "train", "test"]
        seq20 = [split_assignment(i) for i in range(20)]
        assert (seq20.count("train"), seq20.count("val"),
                seq20.count("test")) == (12, 4, 4)

    def test_segmented_window_placement(self, tmp_path, rng):
        """Crop i is confined to disjoint segment [i*c, (i+1)*c) of the
        longer axis (reference data_cropping.py:183-197)."""
        store = LocalStore(tmp_path)
        did = store.create_dataset("exp")
        # tall image: crop_dim = 0, 3 crops of 64 fit in H=300
        stack = rng.integers(0, 65535, (1, 300, 80)).astype(np.uint16)
        store.upload_image(did, "tall.tif", stack)
        gen = CropGenerator(store, crop_size=64, seed=1)
        for _ in range(25):
            crops = gen.next_crops(gen.crop_list(did)[0][0], 0)
            assert len(crops) == 3
            c = 300 // 3
            for i, crop in enumerate(crops):
                assert i * c <= crop.y and crop.y + 64 <= (i + 1) * c
                assert 0 <= crop.x <= 80 - 64
        # crops never overlap along the segmented axis
        ys = sorted(cr.y for cr in crops)
        assert ys[0] + 64 <= ys[1] and ys[1] + 64 <= ys[2]

    def test_small_image_padded_with_frame_min(self, tmp_path, rng):
        """Images down to 0.9x crop size are accepted and padded with the
        frame minimum (reference data_cropping.py:174-180)."""
        store = LocalStore(tmp_path)
        did = store.create_dataset("exp")
        img = rng.integers(100, 65535, (1, 60, 60)).astype(np.uint16)
        store.upload_image(did, "small.tif", img)
        gen = CropGenerator(store, crop_size=64, seed=0)
        items = gen.crop_list(did)
        assert len(items) == 1  # 60 >= 0.9*64 = 57.6 -> accepted
        crops = gen.next_crops(*items[0])
        assert len(crops) == 1
        assert crops[0].img.shape == (64, 64)
        assert (crops[0].y, crops[0].x) == (0, 0)
        # bottom/right padding carries the frame minimum
        assert np.all(crops[0].img[60:, :] == img.min())
        assert np.all(crops[0].img[:, 60:] == img.min())
        # below 0.9x: skipped
        store2 = LocalStore(tmp_path / "s2")
        did2 = store2.create_dataset("exp")
        store2.upload_image(did2, "tiny.tif",
                            rng.integers(0, 9, (1, 50, 50)).astype(np.uint16))
        assert CropGenerator(store2, crop_size=64).crop_list(did2) == []

    def test_frame_stats_stored_not_crop_stats(self, tmp_path, rng):
        """min/max_frame in the crop's map annotation are FULL-FRAME stats
        (reference data_cropping.py:171 — export denormalizes with them)."""
        store = LocalStore(tmp_path)
        did = store.create_dataset("exp")
        frame = rng.integers(500, 60000, (1, 96, 200)).astype(np.uint16)
        frame[0, 0, 0] = 0       # frame min outside most crops
        frame[0, -1, -1] = 65535  # frame max outside most crops
        store.upload_image(did, "m.tif", frame)
        gen = CropGenerator(store, crop_size=64, seed=3)
        crops = gen.next_crops(gen.crop_list(did)[0][0], 0)
        tid = store.create_dataset("trainset")
        cid = gen.upload_crop(crops[1], tid, "train")
        meta = store.get_map_annotation(cid)
        assert float(meta["min_frame"]) == 0.0
        assert float(meta["max_frame"]) == 65535.0

    def test_split_info_persists_across_sessions(self, tmp_path, rng):
        """Used-frame dedup and the num_acc counter survive a restart via
        the trainset's split_info.json annotation (reference gui:2188-2206,
        2782-2796)."""
        store = LocalStore(tmp_path)
        did = store.create_dataset("exp")
        stack = rng.integers(0, 65535, (8, 96, 200)).astype(np.uint16)
        store.upload_image(did, "movie.tif", stack)
        tid = store.create_dataset("trainset")

        gen1 = CropGenerator(store, crop_size=64, seed=0, trainset_id=tid)
        items1 = gen1.crop_list(did)
        iid, frame = items1[0]
        crops = gen1.next_crops(iid, frame)
        gen1.upload_crop(crops[0], tid, "train")
        gen1.mark_skipped(*items1[1])

        # 'restarted session': a fresh generator reloads split_info
        gen2 = CropGenerator(store, crop_size=64, seed=0, trainset_id=tid)
        assert gen2.split_info["num_acc"] == 1
        items2 = gen2.crop_list(did)
        used_frames = {(iid, frame), items1[1]}
        assert used_frames.isdisjoint(set(items2))
        assert len(items2) == len(items1) - 2
        # the next accepted crop continues the counter and naming
        crops2 = gen2.next_crops(*items2[0])
        cid = gen2.upload_crop(crops2[0], tid, split_assignment(
            gen2.split_info["num_acc"]))
        assert store.get_image(cid).name == "img_001.tif"
        assert store.get_map_annotation(cid)["set"] == "train"
