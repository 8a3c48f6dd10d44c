"""Run ALL heavyweight in-suite training experiments in ONE process and
emit a single JSON report (last stdout line).

This is the process-isolation tier for the experiment tests (VERDICT r4
weak #3): the ~8-min tiny-DiT training runs plus their hundreds of XLA
programs used to execute inside the main pytest process, where the
accumulated process state was implicated in a full-suite SIGSEGV.  The
tests (``tests/test_quant_trained.py``,
``tests/test_tea_cache_experiment.py``, ``tests/test_quant_outlier.py``)
now launch THIS script once per session (conftest ``trained_experiments``
fixture) and assert their gates against the parsed report — the same
subprocess pattern ``tests/test_product_flow_cli.py`` uses for the CLIs.

The three experiments share one process so the memoized
``train_tiny_wan_dit_cached`` run is still paid once (quant + TeaCache
use the identical model); the outlier experiment trains its own wide-ffn
model (crest is bounded by sqrt(ffn_dim), so the shared 192-wide ffn
mathematically cannot express the >=30-crest stressor).

Usage: python tools/run_trained_experiments.py [--skip outlier,...]
"""
import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/fairygen_jax"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jsonable(x):
    import numpy as np

    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, np.ndarray):
        return x.tolist()
    if isinstance(x, (np.floating, np.integer, np.bool_)):
        return x.item()
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="",
                    help="comma-separated experiment names to skip "
                         "(quant, tea, outlier)")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    report = {}
    if "quant" not in skip:
        from fairygen_tpu.training.quant_experiment import (
            run_wan_quant_experiment,
        )

        r = run_wan_quant_experiment()
        r.pop("losses", None)
        report["quant"] = _jsonable(r)
        print("# quant experiment done", file=sys.stderr)

    if "tea" not in skip:
        from fairygen_tpu.training.tea_cache_experiment import (
            run_tea_cache_experiment,
        )

        r = run_tea_cache_experiment(target_calc_frac=0.7)
        r.pop("losses", None)
        report["tea"] = _jsonable(r)
        print("# tea_cache experiment done", file=sys.stderr)

    if "outlier" not in skip:
        from fairygen_tpu.training.quant_experiment import (
            run_wan_outlier_experiment,
        )

        r = run_wan_outlier_experiment()
        r.pop("losses", None)
        report["outlier"] = _jsonable(r)
        print("# outlier experiment done", file=sys.stderr)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
