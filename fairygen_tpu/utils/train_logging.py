"""Training metrics logging — TensorBoard / JSONL observability.

The reference logs through HF accelerate's trackers
(``dora_training/train.py:1144,1332`` with ``--report_to tensorboard``);
the diffsynth side only prints.  This provides both: a JSONL metrics file
(always) and a TensorBoard event writer when requested and available
(torch.utils.tensorboard ships with the baked-in torch).
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    """log_dir/metrics.jsonl (+ TensorBoard events with report_to)."""

    def __init__(self, log_dir: str, report_to: Optional[str] = None):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if report_to == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception as e:  # tensorboard genuinely unavailable
                print(f"tensorboard unavailable ({e}); JSONL only")
        self._t0 = time.time()

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
