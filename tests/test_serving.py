"""Batching inference server: coalescing, shape buckets, HTTP roundtrip."""
import json
import threading
import time
import urllib.request

import numpy as np

from fairygen_tpu.serving import BatchingEngine, InferenceServer


class StubPipe:
    """Records batch sizes; returns one array per prompt."""

    def __init__(self, delay=0.0):
        self.batches = []
        self.delay = delay

    def __call__(self, prompts, **params):
        if isinstance(prompts, str):
            prompts = [prompts]
        self.batches.append((len(prompts), tuple(sorted(params.items()))))
        if self.delay:
            time.sleep(self.delay)
        h = params.get("height", 8)
        return [np.full((h, 8, 3), i, np.uint8) for i in range(len(prompts))]


def test_single_request_roundtrip():
    pipe = StubPipe()
    eng = BatchingEngine(pipe, max_batch=4, max_wait_ms=5)
    try:
        req = eng.submit("a cat", height=8)
        out = req.wait(timeout=5)
        assert out.shape == (8, 8, 3)
        assert eng.stats()["requests"] == 1
    finally:
        eng.shutdown()


def test_concurrent_requests_coalesce():
    pipe = StubPipe(delay=0.05)
    eng = BatchingEngine(pipe, max_batch=4, max_wait_ms=200)
    try:
        reqs = [eng.submit(f"p{i}", height=8) for i in range(4)]
        outs = [r.wait(timeout=10) for r in reqs]
        assert all(o.shape == (8, 8, 3) for o in outs)
        # 4 requests with max_batch=4 arrive within the wait window ->
        # one batch of 4
        assert pipe.batches[0][0] == 4
        assert eng.stats()["mean_batch"] == 4.0
    finally:
        eng.shutdown()


def test_shape_buckets_do_not_mix():
    pipe = StubPipe()
    eng = BatchingEngine(pipe, max_batch=8, max_wait_ms=30)
    try:
        a = [eng.submit(f"a{i}", height=8) for i in range(2)]
        b = [eng.submit(f"b{i}", height=16) for i in range(2)]
        for r in a + b:
            r.wait(timeout=10)
        # each signature got its own batch
        sizes = {params: n for n, params in pipe.batches}
        assert sizes[(("height", 8),)] == 2
        assert sizes[(("height", 16),)] == 2
        assert a[0].result.shape[0] == 8
        assert b[0].result.shape[0] == 16
    finally:
        eng.shutdown()


def test_backend_error_propagates():
    def boom(prompts, **params):
        raise ValueError("bad unet")

    eng = BatchingEngine(boom, max_batch=2, max_wait_ms=5)
    try:
        req = eng.submit("x")
        try:
            req.wait(timeout=5)
            raise AssertionError("expected error")
        except RuntimeError as e:
            assert "bad unet" in str(e)
        assert eng.stats()["errors"] == 1
    finally:
        eng.shutdown()


def test_http_server_roundtrip():
    pipe = StubPipe()
    eng = BatchingEngine(pipe, max_batch=2, max_wait_ms=10)
    srv = InferenceServer(eng, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(base + "/healthz", timeout=5) as r:
            assert json.load(r)["ok"] is True
        body = json.dumps(
            {"prompt": "a dog", "params": {"height": 8}}).encode()
        req = urllib.request.Request(base + "/generate", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=10) as r:
            out = json.load(r)["result"]
        assert out["shape"] == [8, 8, 3]
        with urllib.request.urlopen(base + "/metrics", timeout=5) as r:
            m = json.load(r)
        assert m["requests"] == 1 and m["batches"] == 1
    finally:
        srv.stop()


def test_http_concurrent_batching():
    pipe = StubPipe(delay=0.05)
    eng = BatchingEngine(pipe, max_batch=4, max_wait_ms=150)
    srv = InferenceServer(eng, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        results = [None] * 4

        def call(i):
            body = json.dumps({"prompt": f"p{i}"}).encode()
            req = urllib.request.Request(base + "/generate", data=body)
            with urllib.request.urlopen(req, timeout=15) as r:
                results[i] = json.load(r)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all("result" in r for r in results)
        assert max(n for n, _ in pipe.batches) >= 2  # HTTP calls coalesced
    finally:
        srv.stop()


def test_t2i_generate_fn_adapter():
    """t2i_generate_fn drives any single-prompt pipeline through the
    engine (FLUX / Qwen-Image / Z-Image / FLUX.2 surface)."""
    from fairygen_tpu.serving.server import t2i_generate_fn

    calls = []

    class FakePipe:
        def __call__(self, prompt=None, output_type="np", **params):
            calls.append((prompt, output_type, params.get("height")))
            return np.zeros((8, 8, 3), np.uint8)

    eng = BatchingEngine(t2i_generate_fn(FakePipe()), max_batch=4,
                         max_wait_ms=10)
    try:
        rs = [eng.submit(f"p{i}", height=64, width=64) for i in range(3)]
        outs = [r.wait(timeout=5) for r in rs]
    finally:
        eng.shutdown()
    assert all(o.shape == (8, 8, 3) for o in outs)
    assert {c[0] for c in calls} == {"p0", "p1", "p2"}
    assert all(c[1] == "np" and c[2] == 64 for c in calls)
