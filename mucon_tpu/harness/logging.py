"""Observability: JSONL event log, step timing, optional TensorBoard.

The reference gets tqdm bars + TensorBoard from fandak (SURVEY.md §5.1/§5.5);
here every run writes a machine-readable `events.jsonl` (loss components,
learning rate, step timings, eval results), mirrors scalars to TensorBoard
when `torch.utils.tensorboard` is importable, and exposes a
`jax.profiler` trace context for on-demand device profiling.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Optional

import jax


class RunLogger:
    def __init__(self, folder: Path, tensorboard: bool = True):
        self.folder = Path(folder)
        self.folder.mkdir(parents=True, exist_ok=True)
        self._f = open(self.folder / "events.jsonl", "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.folder / "tb"))
            except Exception:
                self._tb = None

    def log(self, kind: str, step: int, **scalars) -> None:
        rec = {"kind": kind, "step": step, "time": time.time()}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                try:
                    self._tb.add_scalar(f"{kind}/{k}", float(v), step)
                except (TypeError, ValueError):
                    pass

    @contextlib.contextmanager
    def profile(self, enabled: bool = True):
        """jax.profiler trace into the run folder (view with TensorBoard)."""
        if not enabled:
            yield
            return
        with jax.profiler.trace(str(self.folder / "profile")):
            yield

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Rolling wall-clock throughput meter."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self.items = []

    def tick(self, n_items: int = 1) -> None:
        self.times.append(time.perf_counter())
        self.items.append(n_items)
        if len(self.times) > self.window:
            self.times.pop(0)
            self.items.pop(0)

    @property
    def items_per_sec(self) -> Optional[float]:
        if len(self.times) < 2:
            return None
        dt = self.times[-1] - self.times[0]
        return sum(self.items[1:]) / dt if dt > 0 else None
