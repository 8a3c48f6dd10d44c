"""Shared harness for the TPU benchmark suite.

TPU-native analogue of the benchmark harness the reference inherits from
diffusers (``stylization/BrushNet/benchmarks/utils.py`` +
``base_classes.py``): the same collated-CSV contract — every benchmark
appends one row to ``collated_results.csv`` — with the CUDA machinery
(``torch.utils.benchmark``, ``cuda.max_memory_allocated``) replaced by
jit warm-up, forced-sync wall timing and XLA device ``memory_stats``.

Timing notes (TPU):
- everything is jitted and warmed once before timing (first compile can
  take minutes through a remote-compile tunnel; the metric excludes it);
- sync via ``float(x.sum())``: on the tunneled axon backend
  ``block_until_ready`` can no-op, a cross-host scalar read cannot.
"""
import csv
import os
import subprocess
import time
from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp

PROMPT = "ghibli style, a fantasy landscape with castles"
# Default to THIS directory (not the CWD): the previous-run baseline that
# push_results.py diffs against is git-pinned to benchmarks/collated_results.csv,
# so a CWD-relative default would read and write different files depending
# on where the suite was launched from.
BASE_PATH = os.environ.get(
    "FAIRYGEN_BENCH_BASE_PATH", os.path.dirname(os.path.abspath(__file__)))
FINAL_CSV_FILE = "collated_results.csv"

BENCHMARK_FIELDS = [
    "pipeline_cls",
    "config",
    "batch_size",
    "num_inference_steps",
    "quantize",
    "time (secs)",
    "images_per_s",
    "memory (gbs)",
    "backend",
    "git_sha",
]


@dataclass
class BenchmarkInfo:
    time: float
    memory: float


def git_sha() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def backend_name() -> str:
    try:
        return jax.devices()[0].platform
    except Exception:
        return "unknown"


def sync(x) -> None:
    """Force full device->host materialization (see module docstring)."""
    float(jnp.asarray(x, jnp.float32).sum())


def device_memory_gbs() -> float:
    """Peak device memory in GiB (0.0 when the backend exposes none)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        if peak:
            return round(peak / 1024**3, 3)
    except Exception:
        pass
    try:  # CPU fallback: live buffers
        total = sum(b.nbytes for b in jax.live_arrays())
        return round(total / 1024**3, 3)
    except Exception:
        return 0.0
    return 0.0


def benchmark_fn(fn, *args, n_iter: int = 3, n_rounds: int = 2) -> float:
    """Best of ``n_rounds`` chains of ``n_iter`` post-warm-up calls
    (one sync per chain so the ~37 ms tunnel round-trip amortizes over
    the chain, not each call), seconds per call.

    Best-of (not single-chain mean) because the tunneled backend
    occasionally stalls a dispatch for hundreds of ms — one hiccup
    poisons a 3-iter mean.  ``fn`` must return a jax array (or pytree
    whose first leaf is one).
    """
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn(*args)
        sync(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def flush() -> None:
    """Drop cached executables + live buffers between benchmarks."""
    jax.clear_caches()


def zeros_params(init_fn):
    """Zero params with the pytree structure/dtypes of ``init_fn()``,
    WITHOUT running it (``eval_shape`` + one zeros-filling jit).

    Timing is weight-independent, and composing the quantizer into
    ``init_fn`` materializes a model directly in its int8 deployment
    form — FLUX.1's 24 GB bf16 tree never exists on a 16 GB chip."""
    shapes = jax.eval_shape(init_fn)
    return jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()


def generate_csv_dict(pipeline_cls: str, config: str, batch_size: int,
                      num_inference_steps: int, total_secs: float,
                      quantize: str = "none",
                      memory_gbs: float = None) -> Dict[str, str]:
    """memory_gbs: pass a reading captured while the model was resident
    (``device_memory_gbs()`` right after the timed step) — sampling here
    would measure the post-teardown heap."""
    imgs = batch_size / total_secs if total_secs > 0 else 0.0
    mem = device_memory_gbs() if memory_gbs is None else memory_gbs
    return {
        "pipeline_cls": pipeline_cls,
        "config": config,
        "batch_size": str(batch_size),
        "num_inference_steps": str(num_inference_steps),
        "quantize": quantize,
        "time (secs)": f"{total_secs:.4f}",
        "images_per_s": f"{imgs:.4f}",
        "memory (gbs)": f"{mem:.3f}",
        "backend": backend_name(),
        "git_sha": git_sha(),
    }


def write_to_csv(rows: List[Dict[str, str]], file_name: str = None) -> str:
    path = file_name or os.path.join(BASE_PATH, FINAL_CSV_FILE)
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=BENCHMARK_FIELDS)
        if not exists:
            w.writeheader()
        for r in rows:
            w.writerow(r)
    return path


def report(rows: List[Dict[str, str]], csv_path: str = None) -> None:
    for r in rows:
        print(f"{r['pipeline_cls']}[{r['config']}] bs={r['batch_size']} "
              f"steps={r['num_inference_steps']} quantize={r['quantize']}: "
              f"{r['time (secs)']}s ({r['images_per_s']} img/s, "
              f"{r['memory (gbs)']} GiB, {r['backend']})", flush=True)
    path = write_to_csv(rows, csv_path)
    print(f"wrote {len(rows)} row(s) -> {path}", flush=True)


def add_common_args(parser) -> None:
    parser.add_argument("--preset", choices=("tiny", "full"), default="full",
                        help="tiny = CPU-runnable smoke shapes")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--num_inference_steps", type=int, default=50)
    parser.add_argument("--n_iter", type=int, default=3,
                        help="timed iterations per measured fn")
    parser.add_argument("--csv", type=str, default=None,
                        help="CSV path (default ./collated_results.csv)")
