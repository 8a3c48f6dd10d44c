"""Production serving: request batching + HTTP front end.

The reference ships only a Gradio demo (app_brushnet.py) that serves one
request at a time; this module is the deployment-grade path the framework
is designed around on TPU:

  - **One dispatch thread.** XLA dispatch is single-stream per device; a
    pool of worker threads would serialize on the device anyway and wreck
    the compile cache with interleaved shapes.  All device work funnels
    through one ``BatchingEngine`` thread.
  - **Shape-bucketed dynamic batching.** Requests are grouped by their
    compile signature (height, width, steps, guidance...) so every batch
    reuses one compiled SPMD program; the batch axis rides the ``data``
    mesh axis when the pipeline carries a mesh (pipelines/sdxl_brushnet.py),
    giving near-linear img/s across chips.
  - **Bounded latency.** A batch launches when ``max_batch`` requests are
    waiting or the oldest request has waited ``max_wait_ms`` — the standard
    throughput/latency knob.

The HTTP layer is stdlib-only (ThreadingHTTPServer): POST /generate with a
JSON body, GET /healthz, GET /metrics.
"""
from __future__ import annotations

import itertools
import json
import threading
import time
from collections import defaultdict, deque
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, List, Optional, Tuple

_req_counter = itertools.count(1)


@dataclass
class Request:
    prompt: str
    params: Dict[str, Any] = field(default_factory=dict)
    enqueued_at: float = field(default_factory=time.monotonic)
    _done: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Optional[str] = None
    id: str = field(default_factory=lambda: f"req-{next(_req_counter)}")
    progress: float = 0.0  # 0..1, updated per dispatch for long requests

    def status(self) -> Dict[str, Any]:
        return {"id": self.id, "done": self._done.is_set(),
                "progress": round(self.progress, 4), "error": self.error}

    def signature(self) -> Tuple:
        """Compile signature: requests in one batch must share it.
        JSON-decoded list params (e.g. hot_lora_scales) hash as tuples."""
        def freeze(v):
            return tuple(freeze(x) for x in v) if isinstance(v, list) else v

        return tuple(sorted((k, freeze(v)) for k, v in self.params.items()))

    def wait(self, timeout: Optional[float] = None):
        if not self._done.wait(timeout):
            raise TimeoutError("generation timed out")
        if self.error is not None:
            raise RuntimeError(self.error)
        return self.result


class BatchingEngine:
    """Collects requests and drives the pipeline from one thread.

    generate_fn(prompts: list[str], **params) -> list of per-prompt results.
    """

    def __init__(self, generate_fn: Callable, *, max_batch: int = 4,
                 max_wait_ms: float = 50.0, max_finished: int = 256):
        self._generate = generate_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.max_finished = max_finished
        self._queues: Dict[Tuple, deque] = defaultdict(deque)
        self._requests: Dict[str, Request] = {}  # id -> live/finished
        self._finished: deque = deque()  # finished ids, oldest first
        self._lock = threading.Condition()
        self._stop = False
        self._stats = {"requests": 0, "batches": 0, "errors": 0,
                       "batched_total": 0}
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="fairygen-batcher")
        self._thread.start()

    # -- client side -----------------------------------------------------
    def submit(self, prompt: str, **params) -> Request:
        req = Request(prompt=prompt, params=params)
        with self._lock:
            self._queues[req.signature()].append(req)
            self._stats["requests"] += 1
            self._requests[req.id] = req
            self._lock.notify()
        return req

    def get(self, request_id: str) -> Optional[Request]:
        with self._lock:
            return self._requests.get(request_id)

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            out = dict(self._stats)
        out["mean_batch"] = (out["batched_total"] / out["batches"]
                             if out["batches"] else 0.0)
        return out

    def shutdown(self, timeout: float = 5.0):
        with self._lock:
            self._stop = True
            self._lock.notify()
        self._thread.join(timeout)

    # -- dispatch thread ---------------------------------------------------
    def _take_batch(self) -> List[Request]:
        """Called under the lock: pick the ripest signature bucket."""
        best, best_age = None, -1.0
        now = time.monotonic()
        for sig, q in self._queues.items():
            if not q:
                continue
            age = now - q[0].enqueued_at
            if len(q) >= self.max_batch or age >= self.max_wait:
                if age > best_age:
                    best, best_age = sig, age
        if best is None:
            return []
        q = self._queues[best]
        return [q.popleft() for _ in range(min(self.max_batch, len(q)))]

    def _run(self):
        while True:
            with self._lock:
                batch = self._take_batch()
                while not batch and not self._stop:
                    # wake when the oldest pending request ripens
                    waits = [q[0].enqueued_at for q in self._queues.values()
                             if q]
                    timeout = None
                    if waits:
                        timeout = max(
                            0.0, min(waits) + self.max_wait - time.monotonic()
                        )
                    self._lock.wait(timeout=timeout if timeout != 0.0
                                    else 0.001)
                    batch = self._take_batch()
                if self._stop and not batch:
                    return
            prompts = [r.prompt for r in batch]
            params = dict(batch[0].params)
            try:
                if getattr(self._generate, "supports_progress", False):
                    def _progress(frac, _batch=batch):
                        for r in _batch:
                            r.progress = frac
                    params["_progress"] = _progress
                results = self._generate(prompts, **params)
                if len(results) != len(batch):
                    raise RuntimeError(
                        f"backend returned {len(results)} results for "
                        f"{len(batch)} prompts")
                for r, res in zip(batch, results):
                    r.result = res
            except Exception as e:  # noqa: BLE001 - surfaced per-request
                for r in batch:
                    r.error = f"{type(e).__name__}: {e}"
                with self._lock:
                    self._stats["errors"] += len(batch)
            finally:
                with self._lock:
                    self._stats["batches"] += 1
                    self._stats["batched_total"] += len(batch)
                    # Bound the finished-request window: results (which can
                    # be whole decoded videos) must not accumulate forever
                    # in a long-running server.  Callers that hold the
                    # Request object (the sync path) are unaffected —
                    # eviction only drops the id -> request index used by
                    # the async /status//result endpoints.
                    for r in batch:
                        self._finished.append(r.id)
                    while len(self._finished) > self.max_finished:
                        self._requests.pop(self._finished.popleft(), None)
                for r in batch:
                    r.progress = 1.0
                    r._done.set()


def sdxl_generate_fn(pipe):
    """Adapt an SDXLBrushNetPipeline to the engine's callable contract."""

    def fn(prompts, **params):
        frames = pipe(prompt=list(prompts) if len(prompts) > 1
                      else prompts[0], **params)
        return list(frames)

    return fn


def t2i_generate_fn(pipe):
    """Adapt a single-prompt t2i pipeline (FluxImagePipeline,
    QwenImagePipeline, ZImagePipeline, Flux2ImagePipeline — all share the
    ``pipe(prompt=..., output_type="np", **params)`` surface) to the
    engine.  Requests still bucket by compile signature, so each bucket
    reuses one compiled program; generation runs per prompt (these DiTs
    are per-sample at the RoPE/packing level)."""

    def fn(prompts, **params):
        params.setdefault("output_type", "np")
        return [pipe(prompt=p, **params) for p in prompts]

    return fn


def video_generate_fn(pipe, *, fps: int = 15, loras=None):
    """Adapt a WanVideoPipeline to the engine.

    Requests bucket by (height, width, num_frames, steps, ...) compile
    signature; generation runs per prompt.  Minute-long requests report
    per-dispatch denoise progress through the engine (GET /status/<id> on
    the server), using the pipeline's ``progress_callback`` hook.

    ``loras``: optional {name: state-dict-or-path} registry for
    per-request adapter selection — requests pass ``lora`` (a registry
    name, or null for the base model) and optionally ``lora_alpha``.
    Both ride the compile signature, so one batch shares one adapter;
    switching between buckets hot-swaps via clear_lora + hotload (no
    retrace when total ranks match — adapters stay unfused)."""
    state = {"active": (None, None)}
    cache: Dict[str, Any] = {}  # name -> loaded state dict (path entries)

    def _select(name, alpha):
        if name is not None and (loras is None or name not in loras):
            raise ValueError(f"unknown lora {name!r} (registry: "
                             f"{sorted(loras or {})})")
        if name is None:
            alpha = None  # base model: alpha irrelevant, avoid spurious swaps
        if state["active"] == (name, alpha):
            return
        # invalidate BEFORE mutating: if load_lora fails after clear_lora,
        # a later request for the old adapter must not be served base
        # weights under the old label
        state["active"] = (None, None)
        pipe.clear_lora()
        if name is not None:
            sd = loras[name]
            if isinstance(sd, (str, bytes)):
                # load each registry path once; swaps then skip disk/convert
                sd = cache.get(name)
                if sd is None:
                    from ..core.io import load_state_dict

                    sd = cache[name] = load_state_dict(loras[name])
            pipe.load_lora(sd, alpha=alpha, hotload=True)
        state["active"] = (name, alpha)

    def fn(prompts, _progress=None, **params):
        _select(params.pop("lora", None), params.pop("lora_alpha", 1.0))
        params.setdefault("output_type", "np")
        outs = []
        n = len(prompts)
        for i, p in enumerate(prompts):
            cb = None
            if _progress is not None:
                def cb(done, total, _i=i):  # noqa: E306
                    _progress((_i + done / max(total, 1)) / n)
            outs.append(pipe(prompt=p, progress_callback=cb, **params))
        return outs

    fn.supports_progress = True
    return fn


class InferenceServer:
    """Minimal stdlib HTTP front end over a BatchingEngine.

    POST /generate  {"prompt": "...", "params": {...}} -> result JSON
    GET  /healthz   -> {"ok": true}
    GET  /metrics   -> engine counters
    """

    def __init__(self, engine: BatchingEngine, *, host: str = "127.0.0.1",
                 port: int = 0, encode_result: Optional[Callable] = None,
                 request_timeout: float = 600.0):
        self.engine = engine
        self._encode = encode_result or _default_encode
        timeout = request_timeout
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(200, {"ok": True})
                elif self.path == "/metrics":
                    self._json(200, outer.engine.stats())
                elif self.path.startswith("/status/"):
                    req = outer.engine.get(self.path[len("/status/"):])
                    if req is None:
                        self._json(404, {"error": "unknown request id"})
                    else:
                        self._json(200, req.status())
                elif self.path.startswith("/result/"):
                    req = outer.engine.get(self.path[len("/result/"):])
                    if req is None:
                        self._json(404, {"error": "unknown request id"})
                    elif not req._done.is_set():
                        self._json(202, req.status())
                    elif req.error is not None:
                        self._json(500, {"error": req.error})
                    else:
                        self._json(200, {"result": outer._encode(req.result)})
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/generate":
                    self._json(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    req = outer.engine.submit(
                        payload["prompt"], **payload.get("params", {}))
                    if payload.get("async"):
                        # long-running (video) requests: poll
                        # /status/<id>, fetch /result/<id>
                        self._json(202, req.status())
                        return
                    result = req.wait(timeout=timeout)
                    self._json(200, {"result": outer._encode(result)})
                except Exception as e:  # noqa: BLE001
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True, name="fairygen-http")

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self.engine.shutdown()


def _default_encode(result):
    import numpy as np

    if isinstance(result, np.ndarray):
        return {"shape": list(result.shape), "dtype": str(result.dtype)}
    return result
