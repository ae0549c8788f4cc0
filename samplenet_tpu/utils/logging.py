"""Logging & metrics: stdout + log file + JSONL metric stream.

Replaces the reference's log_string-to-log_train.txt pattern
(classification/train_samplenet.py:104-107) and its TF-summary scalars with a
framework-agnostic JSONL stream that tensorboard/any dashboard can tail.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any


class Logger:
    def __init__(self, log_dir: str | None = None, name: str = "train"):
        self.log_dir = log_dir
        self._fh = None
        self._metrics_fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, f"log_{name}.txt"), "a")
            self._metrics_fh = open(
                os.path.join(log_dir, f"metrics_{name}.jsonl"), "a"
            )

    def log(self, msg: str) -> None:
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line, file=sys.stdout, flush=True)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()

    def metrics(self, step: int, **kwargs: Any) -> None:
        if self._metrics_fh:
            rec = {"step": int(step), "time": time.time()}
            rec.update({k: float(v) for k, v in kwargs.items()})
            self._metrics_fh.write(json.dumps(rec) + "\n")
            self._metrics_fh.flush()

    def close(self) -> None:
        for fh in (self._fh, self._metrics_fh):
            if fh:
                fh.close()
