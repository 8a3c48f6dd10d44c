"""Smoke tests for the driver-facing surface: ``bench.py`` (tiny preset)
and ``__graft_entry__.entry()``.  These are the programs the external
driver runs; rot here is invisible to the rest of the suite."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_tiny_prints_one_json_line():
    env = dict(os.environ, FAIRYGEN_BENCH_PRESET="tiny",
               JAX_PLATFORMS="cpu", FAIRYGEN_BENCH_WAIT_S="120")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=900, cwd=REPO,
                       env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    json_lines = [ln for ln in r.stdout.splitlines()
                  if ln.strip().startswith("{")]
    assert len(json_lines) == 1, r.stdout
    payload = json.loads(json_lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    assert payload["value"] > 0


@pytest.mark.slow
def test_entry_compiles_on_cpu():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    import jax

    fn, args = g.entry()
    jax.jit(fn).lower(*args)  # compile-check only
