"""Metrics logging: JSONL history + optional TensorBoard + optional W&B.

Re-design of `moe_pretrain_model/framework/visualize/plot.py` (unified
TB/W&B Logger with an async process variant) and the `log_trainer.json`
metric-history sidecar (framework/helpers/saver.py:132-143). The JSONL
file is always the machine-readable record; TensorBoardX and wandb mirror
scalars when their packages are importable (wandb is not in this image —
the flag degrades to a no-op with one warning, keeping sweeps portable).
`AsyncMetricLogger` moves serialization off the train loop thread (the
plot.py AsyncLogger role).
"""

from __future__ import annotations

import json
import queue
import threading
import time
from pathlib import Path
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir, use_tensorboard: bool = True,
                 use_wandb: bool = False, wandb_project: str = "",
                 run_name: str = "", stdout_interval: int = 1):
        self.dir = Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "log_trainer.jsonl", "a")
        self.stdout_interval = stdout_interval
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(str(self.dir / "tb"))
            except Exception:
                self._tb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(
                    project=wandb_project or "competesmoe_tpu",
                    name=run_name or self.dir.name,
                    dir=str(self.dir), resume="allow")
            except Exception as e:
                print(f"wandb unavailable ({type(e).__name__}: {e}); "
                      "metrics continue to JSONL/TB", flush=True)
                self._wandb = None

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
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
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
        if self._wandb is not None:
            self._wandb.finish()


class AsyncMetricLogger(MetricLogger):
    """MetricLogger with a background writer thread so TB/W&B/JSONL IO
    never blocks the train step (the reference's AsyncLogger process,
    visualize/plot.py:619-977, as a thread — sufficient since the writes
    are IO-bound)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._q: queue.Queue = queue.Queue(maxsize=256)
        self._t = threading.Thread(target=self._worker, daemon=True)
        self._t.start()

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            step, metrics, to_stdout = item
            MetricLogger.log(self, step, metrics, to_stdout)

    def log(self, step, metrics, to_stdout=None):
        self._q.put((int(step), dict(metrics), to_stdout))

    def close(self):
        self._q.put(None)
        self._t.join(timeout=10)
        MetricLogger.close(self)


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
