"""Host-side structured metrics logging (CSV/JSONL).

Reference analog: the stdlib-logging mixin + verbosity flags
(SURVEY.md §2.1 #12, `[pvder:pvder/utility_classes.py]` — unverified upstream
path). pvderx returns metrics as dicts from jitted functions; this writer
flushes them to JSONL for dashboards/TensorBoard ingestion (SURVEY.md §5).
"""
from __future__ import annotations

import json
import logging
import time


def get_logger(name: str = "pvderx", level=logging.INFO) -> logging.Logger:
    lg = logging.getLogger(name)
    if not lg.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        lg.addHandler(h)
        lg.setLevel(level)
    return lg


class MetricsLogger:
    """Append-only JSONL metrics writer with wall-clock stamps.

    Optional TensorBoard mirroring via `tensorboard_dir` (uses whichever
    summary-writer implementation is installed; silently disabled when none
    is — this image ships torch's)."""

    def __init__(self, path: str | None = None, echo: bool = False,
                 tensorboard_dir: str | None = None):
        self.path = path
        self.echo = echo
        self._fh = open(path, "a") if path else None
        self._log = get_logger()
        self._t0 = time.time()
        self._tb = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(tensorboard_dir)
            except Exception:  # pragma: no cover - tb backend optional
                self._log.warning("no TensorBoard writer available; "
                                  "tensorboard_dir ignored")

    def write(self, step: int, metrics: dict):
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._tb:
            for k, v in rec.items():
                if k != "step":
                    self._tb.add_scalar(k, v, int(step))
        if self.echo:
            self._log.info(" ".join(f"{k}={v:.5g}" for k, v in rec.items()))
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
        if self._tb:
            self._tb.close()
