"""Collate benchmark CSVs and report deltas vs the last published run
(reference analogue: ``stylization/BrushNet/benchmarks/push_results.py``).

The reference pushes its collated CSV to a HuggingFace dataset and
annotates every numeric column with the percent change against the
previously uploaded run.  This environment has zero egress, so the
"dataset" is the git repo itself: the previous run is read from
``git show <rev>:benchmarks/collated_results.csv`` (default ``HEAD``)
and publishing == committing the refreshed CSV + ``BENCHMARKS.md``.

Differences from the reference (improvements, not omissions):
- rows are matched by benchmark key (pipeline_cls, config, batch_size,
  steps, quantize) instead of by row index, so reordering or newly
  added workloads cannot misalign the comparison;
- a markdown summary table (``BENCHMARKS.md``) is emitted next to the
  CSV for human review.

  python benchmarks/push_results.py                 # deltas vs HEAD
  python benchmarks/push_results.py --previous path/to/old.csv
"""
import argparse
import csv
import glob
import io
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from utils import BASE_PATH, BENCHMARK_FIELDS, FINAL_CSV_FILE  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
KEY_FIELDS = ("pipeline_cls", "config", "batch_size",
              "num_inference_steps", "quantize")
DELTA_FIELDS = ("time (secs)", "images_per_s", "memory (gbs)")


def _strip_annotation(value: str) -> str:
    """'1.23 (+4.5%)' -> '1.23' (previous runs may carry annotations)."""
    return str(value).split()[0] if str(value).strip() else ""


def read_rows(path: str):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def previous_rows(rev: str):
    """Rows of benchmarks/collated_results.csv at ``rev`` (None if absent)."""
    try:
        out = subprocess.run(
            ["git", "show", f"{rev}:benchmarks/{FINAL_CSV_FILE}"],
            capture_output=True, text=True, timeout=30, cwd=HERE)
        if out.returncode != 0:
            return None
        return list(csv.DictReader(io.StringIO(out.stdout)))
    except Exception:
        return None


def collate(paths):
    """Merge rows from ``paths``; later files win on duplicate keys."""
    merged = {}
    for path in paths:
        for row in read_rows(path):
            merged[tuple(row.get(k, "") for k in KEY_FIELDS)] = row
    return list(merged.values())


def annotate(current, previous):
    """Append ' (+x.xx%)' to numeric fields where a previous row matches."""
    prev_by_key = {
        tuple(r.get(k, "") for k in KEY_FIELDS): r for r in (previous or [])}
    for row in current:
        prev = prev_by_key.get(tuple(row.get(k, "") for k in KEY_FIELDS))
        if prev is None:
            # rows carried over from an older collated CSV may still hold a
            # stale '(+x.xx%)' computed against an even older baseline —
            # strip it rather than presenting it as a current delta
            for field in DELTA_FIELDS:
                if row.get(field):
                    row[field] = _strip_annotation(row[field])
            continue
        for field in DELTA_FIELDS:
            try:
                cur = float(_strip_annotation(row.get(field, "")))
                old = float(_strip_annotation(prev.get(field, "")))
            except (TypeError, ValueError):
                continue
            if old == 0.0:
                continue
            pct = (cur - old) / old * 100.0
            row[field] = f"{cur} ({'+' if pct > 0 else ''}{pct:.2f}%)"
    return current


def write_markdown(rows, path):
    cols = BENCHMARK_FIELDS
    lines = ["# Benchmark results", "",
             "Collated by `benchmarks/push_results.py`; percent changes are "
             "vs the previously committed `collated_results.csv`.", "",
             "| " + " | ".join(cols) + " |",
             "|" + "|".join("---" for _ in cols) + "|"]
    for row in rows:
        lines.append("| " + " | ".join(str(row.get(c, "")) for c in cols) + " |")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--previous", type=str, default=None,
                   help="CSV to diff against (default: git HEAD's copy)")
    p.add_argument("--rev", type=str, default="HEAD",
                   help="git rev for the previous CSV when --previous unset")
    p.add_argument("--glob", type=str, default=None,
                   help="extra per-run CSVs to merge in (later rows win)")
    p.add_argument("--csv", type=str, default=None,
                   help="output CSV (default benchmarks/collated_results.csv)")
    p.add_argument("--markdown", type=str, default=None,
                   help="output markdown (default alongside the CSV)")
    args = p.parse_args()

    out_csv = args.csv or os.path.join(BASE_PATH, FINAL_CSV_FILE)
    sources = []
    if os.path.exists(out_csv):
        sources.append(out_csv)
    if args.glob:
        sources += sorted(p for p in glob.glob(args.glob)
                          if os.path.abspath(p) != os.path.abspath(out_csv))
    if not sources:
        print("no CSVs found to collate", file=sys.stderr)
        sys.exit(1)

    previous = (read_rows(args.previous) if args.previous
                else previous_rows(args.rev))
    rows = annotate(collate(sources), previous)

    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=BENCHMARK_FIELDS)
        w.writeheader()
        for row in rows:
            w.writerow({k: row.get(k, "") for k in BENCHMARK_FIELDS})
    md = write_markdown(rows, args.markdown or
                        os.path.join(os.path.dirname(out_csv) or ".",
                                     "BENCHMARKS.md"))
    print(f"collated {len(rows)} row(s) from {len(sources)} file(s) -> "
          f"{out_csv}; summary -> {md}", flush=True)


if __name__ == "__main__":
    main()
