"""Serving daemon: real HTTP round-trips against the real handler stack."""

import io
import json
import threading
from http.client import HTTPConnection

import numpy as np
import pytest

from microbeseg_tpu.config import InferConfig
from microbeseg_tpu.inference.engine import InferenceEngine

from tests.test_inference import AnalyticModel, _frames_from_blobs


@pytest.fixture()
def server(rng):
    from microbeseg_tpu.cli.serve import serve

    engine = InferenceEngine(AnalyticModel(), {}, "distance",
                             cfg=InferConfig(batch_size=4))
    httpd = serve(engine, {"model": ["analytic"], "label_type": "distance"},
                  "127.0.0.1", 0)  # ephemeral port
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        yield httpd.server_address
    finally:
        httpd.shutdown()
        httpd.server_close()
        thread.join(timeout=5)


def _post(addr, path, body, headers=None):
    conn = HTTPConnection(*addr, timeout=120)
    conn.request("POST", path, body=body, headers=headers or {})
    resp = conn.getresponse()
    data = resp.read()
    out = (resp.status, dict(resp.getheaders()), data)
    conn.close()
    return out


class TestServe:
    def test_healthz(self, server):
        conn = HTTPConnection(*server, timeout=30)
        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        payload = json.loads(resp.read())
        conn.close()
        assert resp.status == 200
        assert payload["status"] == "ok"
        assert payload["label_type"] == "distance"

    def test_segment_npy_roundtrip(self, server, rng):
        frames = _frames_from_blobs(rng, n=2, shape=(60, 70))
        buf = io.BytesIO()
        np.save(buf, frames, allow_pickle=False)
        status, headers, data = _post(server, "/segment", buf.getvalue())
        assert status == 200, data
        assert headers["Content-Type"] == "application/x-npy"
        masks = np.load(io.BytesIO(data), allow_pickle=False)
        assert masks.shape == (2, 60, 70) and masks.dtype == np.uint16
        counts = [int(c) for c in headers["X-Instances"].split(",")]
        assert counts == [int(m.max()) for m in masks]
        assert all(c > 0 for c in counts)

    def test_segment_tif_in_tif_out(self, server, rng):
        from PIL import Image

        frames = _frames_from_blobs(rng, n=2, shape=(60, 70))
        pil = [Image.fromarray(f) for f in frames]
        buf = io.BytesIO()
        pil[0].save(buf, format="TIFF", save_all=True, append_images=pil[1:])
        status, headers, data = _post(server, "/segment?format=tif",
                                      buf.getvalue())
        assert status == 200, data
        assert headers["Content-Type"] == "image/tiff"
        with Image.open(io.BytesIO(data)) as im:
            assert getattr(im, "n_frames", 1) == 2
            im.seek(0)
            m0 = np.asarray(im)
        assert m0.shape == (60, 70) and m0.max() > 0

    def test_threshold_query_params_change_result(self, server, rng):
        frames = _frames_from_blobs(rng, n=1, shape=(60, 70))
        buf = io.BytesIO()
        np.save(buf, frames, allow_pickle=False)
        body = buf.getvalue()
        _, _, loose = _post(server, "/segment?th_cell=0.05", body)
        _, _, strict = _post(server, "/segment?th_cell=0.6", body)
        loose_m = np.load(io.BytesIO(loose), allow_pickle=False)
        strict_m = np.load(io.BytesIO(strict), allow_pickle=False)
        # a stricter cell threshold keeps strictly fewer foreground pixels
        assert (strict_m > 0).sum() < (loose_m > 0).sum()

    def test_bad_payload_is_a_400_not_a_crash(self, server):
        status, _, data = _post(server, "/segment", b"not an image")
        assert status == 400
        assert "error" in json.loads(data)
        # the server is still alive afterwards
        conn = HTTPConnection(*server, timeout=30)
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
        conn.close()

    def test_unknown_path_404(self, server):
        status, _, _ = _post(server, "/nope", b"")
        assert status == 404

    def test_unknown_format_is_400(self, server, rng):
        frames = _frames_from_blobs(rng, n=1, shape=(60, 70))
        buf = io.BytesIO()
        np.save(buf, frames, allow_pickle=False)
        status, _, data = _post(server, "/segment?format=png", buf.getvalue())
        assert status == 400 and "format" in json.loads(data)["error"]
        # 'tiff' is accepted as an alias for 'tif'
        status, headers, _ = _post(server, "/segment?format=tiff",
                                   buf.getvalue())
        assert status == 200 and headers["Content-Type"] == "image/tiff"

    def test_engine_failure_is_500_not_400(self, rng):
        """Server-side failures on a valid request must read as a server
        fault (retryable), not a rejected request."""
        from microbeseg_tpu.cli.serve import serve

        class ExplodingEngine:
            cfg = InferConfig()
            label_type = "distance"

            def segment(self, *a, **k):
                raise RuntimeError("RESOURCE_EXHAUSTED: synthetic")

        httpd = serve(ExplodingEngine(), {"model": ["x"]}, "127.0.0.1", 0)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        try:
            frames = _frames_from_blobs(rng, n=1, shape=(60, 70))
            buf = io.BytesIO()
            np.save(buf, frames, allow_pickle=False)
            status, _, data = _post(httpd.server_address, "/segment",
                                    buf.getvalue())
            assert status == 500
            assert "RESOURCE_EXHAUSTED" in json.loads(data)["error"]
        finally:
            httpd.shutdown()
            httpd.server_close()
            thread.join(timeout=5)


class TestServeCli:
    def test_parser_defaults(self):
        from microbeseg_tpu.cli.serve import build_parser

        args = build_parser().parse_args(["--model", "m", "--port", "9000"])
        assert args.port == 9000 and args.thresholds == [0.10, 0.45]
        assert not args.tta and not args.sliding_window

    def test_oversized_payload_is_413_before_read(self, server, rng):
        """A Content-Length above the limit is refused with 413 WITHOUT
        reading the body (the daemon must not buffer a runaway upload)."""
        from microbeseg_tpu.cli.serve import serve as _  # noqa: F401

        conn = HTTPConnection(*server, timeout=120)
        # announce a huge body but only send headers: a pre-read refusal
        # answers immediately; a handler that tried to read would block
        conn.putrequest("POST", "/segment")
        conn.putheader("Content-Length", str(600 * 1024 * 1024))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        assert b"exceeds" in resp.read()
        conn.close()

    def test_concurrent_clients_correct_and_isolated(self, server, rng):
        """Threaded daemon (VERDICT r4 item 7): N clients posting
        SIMULTANEOUSLY each get their own correct masks back — the device
        lock serializes the engine while decode/encode overlap."""
        payloads, expected = [], []
        for i in range(4):
            frames = _frames_from_blobs(rng, n=2, shape=(48 + 4 * i, 52))
            buf = io.BytesIO()
            np.save(buf, frames, allow_pickle=False)
            payloads.append(buf.getvalue())
            expected.append(frames.shape)
        results = [None] * len(payloads)

        def client(i):
            results[i] = _post(server, "/segment", payloads[i])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(payloads))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i, res in enumerate(results):
            assert res is not None, f"client {i} hung"
            status, headers, data = res
            assert status == 200, data
            masks = np.load(io.BytesIO(data), allow_pickle=False)
            assert masks.shape == expected[i]
            assert all(int(c) > 0
                       for c in headers["X-Instances"].split(","))

    def test_malformed_content_length_is_400(self, server, rng):
        """ADVICE r4: a non-numeric Content-Length must yield a 400 JSON
        error, not an uncaught ValueError and a dropped connection."""
        conn = HTTPConnection(*server, timeout=120)
        conn.putrequest("POST", "/segment")
        conn.putheader("Content-Length", "banana")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"Content-Length" in resp.read()
        conn.close()

    def test_sequential_clients_share_the_engine(self, server, rng):
        """Two clients on separate connections, one after the other (the
        single-threaded-by-design serialization point is the engine): both
        get correct independent answers, and a 400 from the first client
        does not poison the second."""
        bad = _post(server, "/segment", b"not an image at all")
        assert bad[0] == 400
        for _client in range(2):
            frames = _frames_from_blobs(rng, n=2, shape=(48, 52))
            buf = io.BytesIO()
            np.save(buf, frames, allow_pickle=False)
            status, headers, data = _post(server, "/segment", buf.getvalue())
            assert status == 200
            masks = np.load(io.BytesIO(data), allow_pickle=False)
            assert masks.shape == (2, 48, 52)
            assert masks.max() > 0
