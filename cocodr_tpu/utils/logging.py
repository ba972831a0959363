"""Observability: TensorBoard scalars + step timing + jax.profiler traces.

The reference logs loss/lr/grad-norm/dev-nDCG per step to tensorboardX
(reference ANCE/drivers/run_ann.py:358-374) and has no profiling at all
(SURVEY.md §5); here profiling is first-class via jax.profiler.
"""
from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Optional

logger = logging.getLogger("cocodr_tpu")


class MetricsLogger:
    """TensorBoard (tensorboardX, optional) + JSONL metrics sink."""

    def __init__(self, log_dir: Optional[str] = None,
                 jsonl_path: Optional[str] = None):
        self._tb = None
        if log_dir:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except ImportError:
                logger.warning("tensorboardX unavailable; TB logging off")
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        if self._tb:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(f"{prefix}{k}", float(v), step)
                except (TypeError, ValueError):
                    pass
        if self._jsonl:
            rec = {"step": step}
            rec.update(
                {f"{prefix}{k}": _scalar(v) for k, v in metrics.items()}
            )
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()

    def log_histogram(self, step: int, tag: str, values):
        if self._tb:
            self._tb.add_histogram(tag, values, step)

    def close(self):
        if self._tb:
            self._tb.close()
        if self._jsonl:
            self._jsonl.close()


def _scalar(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


class StepTimer:
    """Per-phase wall-clock accounting (encode / search / train / mine)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_s": self.totals[k] / self.counts[k],
            }
            for k in self.totals
        }


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
