"""Evaluation loop.

Re-design of `evaluate/lmms_eval/evaluator.py:34-658`: `simple_evaluate`
(seeds, task build, `return_id_experts` threading) -> `evaluate` (request
building with rank/world splitting, grouped dispatch by request type,
filter pipeline, aggregation, table print).
"""

from __future__ import annotations

import json
import random
from typing import Any, Dict, List, Optional

import numpy as np

from .task import ConfigurableTask, get_task_config


def simple_evaluate(lm, tasks: List[str], limit: Optional[int] = None,
                    rank: int = 0, world_size: int = 1,
                    return_id_experts: bool = False,
                    seed: int = 0) -> Dict[str, Any]:
    random.seed(seed)
    np.random.seed(seed)
    task_objs = {name: ConfigurableTask(get_task_config(name), limit=limit)
                 for name in tasks}
    results = evaluate(lm, task_objs, rank=rank, world_size=world_size,
                       return_id_experts=return_id_experts)
    return results


def evaluate(lm, task_objs: Dict[str, ConfigurableTask], rank: int = 0,
             world_size: int = 1,
             return_id_experts: bool = False) -> Dict[str, Any]:
    # 1. build requests per task, rank-sliced (evaluator.py:257-296)
    requests_by_type: Dict[str, list] = {}
    for name, task in task_objs.items():
        for inst in task.build_all_requests(rank=rank,
                                            world_size=world_size):
            requests_by_type.setdefault(inst.request_type, []).append(inst)

    # 2. grouped dispatch (evaluator.py:300-301)
    for reqtype, reqs in requests_by_type.items():
        fn = getattr(lm, reqtype)
        fn(reqs, return_id_experts=return_id_experts)

    # 3. filters + scoring per task
    results: Dict[str, Any] = {"results": {}, "samples": {}}
    for name, task in task_objs.items():
        task.apply_filters()
        results["results"][name] = task.score()
        samples = []
        for inst in task.instances:
            rec = {"doc_id": inst.doc_id,
                   "resps": inst.resps,
                   "filtered": inst.filtered_resps.get("default")}
            if return_id_experts:
                rec["logs_metrics_vision"] = inst.logs_metrics_vision
                rec["logs_metrics_mlp"] = inst.logs_metrics_mlp
            samples.append(rec)
        results["samples"][name] = samples
    return results


def make_table(results: Dict[str, Any]) -> str:
    """Plain-text results table (utils.py make_table role)."""
    lines = [f"{'Task':<24} {'Metric':<16} {'Value':>10}"]
    lines.append("-" * 52)
    for task, metrics in results["results"].items():
        for metric, value in metrics.items():
            lines.append(f"{task:<24} {metric:<16} {value:>10.4f}")
    return "\n".join(lines)
