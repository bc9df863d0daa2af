"""Serving daemon: dynamic batcher semantics + HTTP API (infer/server.py)."""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from cvm_tpu.infer.server import DynamicBatcher, ModelServer, result_record


def _jpeg(rng, hw=(40, 44)) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (*hw, 3), dtype=np.uint8)).save(
        buf, format="JPEG")
    return buf.getvalue()


def test_batcher_coalesces_concurrent_requests():
    calls = []

    def model(x, hw):
        calls.append(x.shape[0])
        return {"val": x * 2.0}

    b = DynamicBatcher(model, batch_size=4, max_wait_ms=500.0)
    try:
        results = {}

        def go(i):
            x = np.full((1, 3), float(i), np.float32)
            results[i] = b.submit((x, np.asarray([[3, 3]], np.int32)))

        ts = [threading.Thread(target=go, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        # Every caller got ITS row back, doubled.
        for i in range(4):
            np.testing.assert_allclose(results[i]["val"], [[2.0 * i] * 3])
        # The 4 requests coalesced into at most 2 fixed-shape dispatches
        # (1 when all landed inside the window), every dispatch full-size.
        assert len(calls) <= 2 and all(c == 4 for c in calls)
        st = b.stats()
        assert st["requests"] == 4 and st["latency_ms"]["n"] == 4
    finally:
        b.close()


def test_batcher_pads_partial_batch_and_reports_fill():
    def model(x):
        assert x.shape[0] == 4  # the exported program's static batch
        return {"val": x + 1.0}

    b = DynamicBatcher(model, batch_size=4, max_wait_ms=1.0)
    try:
        out = b.submit((np.zeros((1, 2), np.float32),))
        np.testing.assert_allclose(out["val"], [[1.0, 1.0]])
        st = b.stats()
        assert st["batches"] == 1 and st["batch_fill"] == 0.25
    finally:
        b.close()


def test_batcher_error_propagates_and_keeps_serving():
    state = {"fail": True}

    def model(x):
        if state["fail"]:
            raise ValueError("boom")
        return {"val": x}

    b = DynamicBatcher(model, batch_size=2, max_wait_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            b.submit((np.zeros((1, 1), np.float32),))
        state["fail"] = False
        out = b.submit((np.ones((1, 1), np.float32),))
        np.testing.assert_allclose(out["val"], [[1.0]])
    finally:
        b.close()


def test_batcher_full_queue_sheds_load_as_overloaded():
    """A saturated bounded queue raises OverloadedError (→ HTTP 503), not a
    bare queue.Full that would crash the connection handler."""
    from cvm_tpu.infer.server import OverloadedError

    release = threading.Event()
    entered = threading.Event()

    def model(x):
        entered.set()
        release.wait(30)
        return {"val": x}

    b = DynamicBatcher(model, batch_size=1, max_wait_ms=1.0, max_queue=1)
    workers = []
    try:
        # Request A occupies the batcher thread inside model_fn; request B
        # fills the single queue slot behind it; C must then shed instantly.
        for _ in range(2):
            t = threading.Thread(
                target=lambda: b.submit((np.zeros((1, 1), np.float32),)))
            t.start()
            workers.append(t)
            if not entered.is_set():
                assert entered.wait(10)
        deadline = time.time() + 10
        while b._q.qsize() < 1:
            assert time.time() < deadline
            time.sleep(0.01)
        with pytest.raises(OverloadedError, match="queue full"):
            b.submit((np.zeros((1, 1), np.float32),), enqueue_timeout_s=0.05)
    finally:
        release.set()
        for t in workers:
            t.join(timeout=30)
        b.close()


def test_batcher_rejects_multi_row_items():
    b = DynamicBatcher(lambda x: {"v": x}, batch_size=2)
    try:
        with pytest.raises(ValueError, match="single rows"):
            b.submit((np.zeros((2, 3), np.float32),))
    finally:
        b.close()


def test_result_record_shapes():
    out = {
        "boxes": np.asarray([[[0, 0, 10, 10], [1, 1, 2, 2]]], np.float32),
        "scores": np.asarray([[0.9, 0.1]], np.float32),
        "classes": np.asarray([[3, 1]], np.int32),
        "class_map": np.zeros((1, 4, 4), np.int32),
        "depth": np.full((1, 4, 4, 1), 2.0, np.float32),
    }
    rec = result_record(out, 0, score_threshold=0.5)
    assert rec["boxes"] == [[0, 0, 10, 10]] and rec["classes"] == [3]
    assert rec["class_histogram"] == [16]
    assert rec["depth_mean"] == 2.0


class _HttpServerFixture:
    """Start ModelServer on an ephemeral port; tear down on exit."""

    def __init__(self, server: ModelServer):
        self.server = server
        self.port = None
        ready = threading.Event()

        def cb(port):
            self.port = port
            ready.set()

        self.thread = threading.Thread(
            target=server.serve_forever,
            kwargs=dict(host="127.0.0.1", port=0, ready_cb=cb), daemon=True)
        self.thread.start()
        assert ready.wait(30)

    def get(self, path):
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{self.port}{path}", timeout=30) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def post(self, path, body, headers=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{self.port}{path}", data=body,
            headers=headers or {}, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def wait_warm(self, timeout=60):
        t0 = time.time()
        while time.time() - t0 < timeout:
            code, _ = self.get("/healthz")
            if code == 200:
                return
            time.sleep(0.05)
        raise TimeoutError("server never went warm")

    def close(self):
        self.server.shutdown()
        self.thread.join(timeout=10)


def test_http_server_stub_model(rng):
    """Full HTTP loop against a stub model: decode → batch → JSON fan-out,
    health gating, stats, and input validation — no artifact, no jit."""
    def model(img, hw):
        B = img.shape[0]
        return {"class_map": np.tile(
            np.arange(4, dtype=np.int32).reshape(1, 2, 2), (B, 1, 1))}

    srv = ModelServer(model, batch_size=2, pad_hw=(48, 48),
                      input_format="rgb", max_wait_ms=2.0)
    fx = _HttpServerFixture(srv)
    try:
        fx.wait_warm()
        code, rec = fx.post("/predict", _jpeg(rng))
        assert code == 200 and rec["class_histogram"] == [1, 1, 1, 1]

        code, err = fx.post("/predict", b"not an image")
        assert code == 400 and "decode" in err["error"]

        code, err = fx.post("/predict", b"")
        assert code == 400

        code, st = fx.get("/stats")
        assert code == 200 and st["requests"] >= 2  # warmup + 1 ok request
        assert st["model_ms"]["n"] >= 2 and st["warm"]

        # Prometheus text exposition mirrors /stats (scrape-ready, no
        # adapter): counters carry the model label; latency percentiles
        # surface as quantile-labelled gauges.
        with urllib.request.urlopen(
                f"http://127.0.0.1:{fx.port}/metrics", timeout=30) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "# TYPE cvm_requests_total counter" in text
        import re as _re

        m = _re.search(r'cvm_requests_total\{model="\?"\} (\d+)', text)
        assert m and int(m.group(1)) == st["requests"]
        assert 'cvm_warm{model="?"} 1' in text
        assert _re.search(
            r'cvm_model_ms\{model="\?",quantile="0.5"\} [\d.]+', text)

        code, _ = fx.get("/nope")
        assert code == 404

        # A malformed Content-Length gets a clean 400, not a dropped
        # connection from an uncaught ValueError in the handler thread.
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", fx.port, timeout=30)
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Length", "abc")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert "Content-Length" in json.loads(resp.read())["error"]
        conn.close()
    finally:
        fx.close()


def test_http_server_concurrent_requests_batch(rng):
    seen = []

    def model(img, hw):
        seen.append(img.shape[0])
        B = img.shape[0]
        return {"depth": np.full((B, 2, 2, 1), 3.0, np.float32)}

    srv = ModelServer(model, batch_size=4, pad_hw=(48, 48),
                      input_format="rgb", max_wait_ms=200.0)
    fx = _HttpServerFixture(srv)
    try:
        fx.wait_warm()
        results = []

        def go():
            results.append(fx.post("/predict", _jpeg(rng)))

        ts = [threading.Thread(target=go) for _ in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        assert len(results) == 4
        assert all(c == 200 and r["depth_mean"] == 3.0 for c, r in results)
        assert all(s == 4 for s in seen)  # every dispatch was full-shape
    finally:
        fx.close()


@pytest.mark.slow
def test_http_server_real_artifact(tmp_path, rng):
    """Daemon over a REAL exported artifact: train → export → serve over
    HTTP → assert prediction + dynamic-batching stats."""
    import itertools

    from cvm_tpu.cli.export import export_model
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.infer.runtime import ServingModel
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1,
                 log_every=1)
    tr.init_state()
    pool = [synthetic_batch(np.random.default_rng(0), 8, (48, 48),
                            num_classes=3)]
    tr.fit(itertools.cycle(pool), 1)
    tr.ckpt.wait()
    art = str(tmp_path / "art")
    export_model("semseg", ckdir, art, batch_size=2, pad_hw=(48, 48))

    model = ServingModel(art)
    srv = ModelServer(model, batch_size=2, pad_hw=(48, 48),
                      input_format=model.input_format, meta=model.meta,
                      max_wait_ms=2.0)
    fx = _HttpServerFixture(srv)
    try:
        fx.wait_warm(timeout=300)  # warmup runs the compiled program once
        code, rec = fx.post("/predict", _jpeg(rng))
        assert code == 200
        assert sum(rec["class_histogram"]) == 32 * 32  # class_map pixels
        code, st = fx.get("/stats")
        assert st["batch_size"] == 2 and st["batches"] >= 1
    finally:
        fx.close()


def test_serve_cli_rejects_malformed_http_address():
    """--http without a numeric port is an argparse error, not an int()
    traceback."""
    from cvm_tpu.cli.serve import main

    for bad in ("localhost", "127.0.0.1:", ":", "host:port"):
        with pytest.raises(SystemExit) as e:
            main(["--artifact", "unused", "--http", bad])
        assert e.value.code == 2


def test_server_rejects_dmds_artifacts():
    with pytest.raises(ValueError, match="dmds"):
        ModelServer(lambda *a: {}, batch_size=1, pad_hw=(48, 48),
                    meta={"model": "dmds"})


def test_batcher_dispatches_on_smallest_fitting_bucket():
    """With bucket_sizes, a 1-request window pads to 2 (not the full 8):
    less padding waste per dispatch on multi-batch artifacts."""
    seen = []

    def model(x):
        seen.append(x.shape[0])
        return {"val": x + 1.0}

    b = DynamicBatcher(model, batch_size=8, max_wait_ms=1.0,
                       bucket_sizes=[2, 4, 8])
    try:
        out = b.submit((np.zeros((1, 2), np.float32),))
        np.testing.assert_allclose(out["val"], [[1.0, 1.0]])
        assert seen == [2], f"expected bucket-2 dispatch, got {seen}"
        st = b.stats()
        assert st["batch_fill"] == 0.5  # 1 real row of 2 dispatched
    finally:
        b.close()
