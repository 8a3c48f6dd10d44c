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
    "benchmark_img2img.py",
    "benchmark_controlnet.py",
    "benchmark_ip_adapters.py",
    "benchmark_serving.py",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=("tiny", "full"), default="full")
    p.add_argument("--csv", type=str, default=None)
    p.add_argument("--timeout", type=int, default=3600, help="per-script cap")
    p.add_argument("--batch_sizes", type=int, nargs="+", default=[1],
                   help="sweep: run the whole suite once per batch size")
    p.add_argument("--collate", action="store_true",
                   help="run push_results.py afterwards (delta-annotated "
                        "collated CSV + BENCHMARKS.md)")
    args = p.parse_args()

    failures = []
    for batch_size in args.batch_sizes:
        for script in SUITE:
            cmd = [sys.executable, os.path.join(HERE, script),
                   "--preset", args.preset, "--batch_size", str(batch_size)]
            if args.csv:
                cmd += ["--csv", args.csv]
            print(f"=== {script} (bs={batch_size}) ===", flush=True)
            r = subprocess.run(cmd, timeout=args.timeout)
            if r.returncode != 0:
                failures.append(f"{script}@bs{batch_size}")
    if failures:
        print(f"FAILED: {failures}", file=sys.stderr)
        sys.exit(1)
    if args.collate:
        cmd = [sys.executable, os.path.join(HERE, "push_results.py")]
        if args.csv:
            cmd += ["--csv", args.csv]
        subprocess.run(cmd, timeout=300, check=True)
    print("suite complete", flush=True)


if __name__ == "__main__":
    main()
