"""Metrics logging: JSONL history + optional TensorBoard.

Re-design of `moe_pretrain_model/framework/visualize/plot.py` (unified
TB/W&B Logger) and the `log_trainer.json` metric-history sidecar
(framework/helpers/saver.py:132-143). W&B is not in the image; the JSONL
file is the machine-readable record and TensorBoardX mirrors scalars when
available.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir, use_tensorboard: bool = True,
                 stdout_interval: int = 1):
        self.dir = Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "log_trainer.jsonl", "a")
        self.stdout_interval = stdout_interval
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(str(self.dir / "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float],
            to_stdout: Optional[bool] = None) -> None:
        rec = {"step": int(step), "time": time.time()}
        scalars = {}
        for k, v in metrics.items():
            try:
                scalars[k] = float(v)
            except (TypeError, ValueError):
                continue
        rec.update(scalars)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        show = to_stdout if to_stdout is not None else (
            self.stdout_interval and step % self.stdout_interval == 0)
        if show:
            parts = " ".join(f"{k}={v:.4g}" for k, v in sorted(scalars.items())
                             if not k.startswith("layer"))
            print(f"[step {step}] {parts}", flush=True)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def device_memory_stats() -> Dict[str, float]:
    """Peak/in-use device memory in MB (the EfficiencyCallback's CUDA
    peak-mem channel, moe_model/train/callback.py:92-256, via the TPU
    allocator stats)."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return {}
    out = {}
    if "peak_bytes_in_use" in stats:
        out["memory/peak_mb"] = stats["peak_bytes_in_use"] / 2**20
    if "bytes_in_use" in stats:
        out["memory/in_use_mb"] = stats["bytes_in_use"] / 2**20
    return out


class ElapsedTimeMeter:
    """Accumulating wall-clock meter (framework/utils timing meters;
    task.py:360-373 logs timing/ms_per_iter etc.)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1
        self._t0 = None

    @property
    def mean_ms(self) -> float:
        return 1000.0 * self.total / max(self.count, 1)

    def reset(self):
        self.total = 0.0
        self.count = 0
