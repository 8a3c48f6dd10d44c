"""Run the full benchmark suite (reference analogue:
``stylization/BrushNet/benchmarks/run_all.py``).

Each workload runs in its own subprocess so device memory is fully
returned between benchmarks (the XLA client frees everything at process
exit — the in-process ``flush()`` cannot reclaim compiled-executable
arenas).  All rows collate into one ``collated_results.csv``.

  python benchmarks/run_all.py --preset tiny   # CPU smoke
  python benchmarks/run_all.py                 # full, on the attached TPU
"""
import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SUITE = (
    "benchmark_text_to_image.py",
    "benchmark_t2i_lcm_lora.py",
    "benchmark_inpainting.py",
    "benchmark_controlnet.py",
    "benchmark_ip_adapters.py",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=("tiny", "full"), default="full")
    p.add_argument("--csv", type=str, default=None)
    p.add_argument("--timeout", type=int, default=3600, help="per-script cap")
    args = p.parse_args()

    failures = []
    for script in SUITE:
        cmd = [sys.executable, os.path.join(HERE, script),
               "--preset", args.preset]
        if args.csv:
            cmd += ["--csv", args.csv]
        print(f"=== {script} ===", flush=True)
        r = subprocess.run(cmd, timeout=args.timeout)
        if r.returncode != 0:
            failures.append(script)
    if failures:
        print(f"FAILED: {failures}", file=sys.stderr)
        sys.exit(1)
    print("suite complete", flush=True)


if __name__ == "__main__":
    main()
