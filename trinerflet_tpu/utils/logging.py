"""Experiment logging, tracing, and config snapshots.

Parity targets from the reference (SURVEY §5):
* tensorboardX scalars (train/loss, train/lr, loss_components/*;
  reconstruction/nerf/utils.py:1183-1194),
* append-only text log ``log_{name}.txt`` + console (:457-467, 521-528),
* config JSON dump at trainer init (:489-492),
* and — new, TPU-first — ``jax.profiler`` trace capture as a first-class hook
  (the reference has only wall-clock timers; SURVEY §5 'tracing/profiling').
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

__all__ = ["ExperimentLogger", "profile_trace", "StepTimer"]


class ExperimentLogger:
    def __init__(self, workspace: str, name: str = "trinerflet", use_tensorboard: bool = True):
        self.workspace = workspace
        self.name = name
        os.makedirs(workspace, exist_ok=True)
        self.log_path = os.path.join(workspace, f"log_{name}.txt")
        self.writer = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(os.path.join(workspace, "run", name))
            except Exception:
                self.writer = None

    def text(self, msg: str, to_console: bool = True):
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        with open(self.log_path, "a") as f:
            f.write(f"[{stamp}] {msg}\n")
        if to_console:
            print(msg)

    def scalars(self, step: int, values: Dict[str, float], prefix: str = "train"):
        if self.writer is None:
            return
        for k, v in values.items():
            try:
                self.writer.add_scalar(f"{prefix}/{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def config(self, cfg: Any, fname: str = "config.json"):
        """Snapshot configs (reference dumps opt as json at Trainer init)."""
        import dataclasses

        def enc(o):
            if dataclasses.is_dataclass(o):
                return dataclasses.asdict(o)
            return str(o)

        with open(os.path.join(self.workspace, fname), "w") as f:
            json.dump(cfg, f, indent=2, default=enc)

    def close(self):
        if self.writer is not None:
            self.writer.close()


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time / throughput meter (per-epoch and total wall times in
    the reference, utils.py:796-815)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times = []
        self.last = None
        self.t0 = time.perf_counter()

    def tick(self):
        now = time.perf_counter()
        if self.last is not None:
            self.times.append(now - self.last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self.last = now

    @property
    def mean_ms(self) -> float:
        return 1e3 * sum(self.times) / max(len(self.times), 1)

    @property
    def total_s(self) -> float:
        return time.perf_counter() - self.t0
