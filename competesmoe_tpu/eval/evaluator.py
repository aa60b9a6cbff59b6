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
    # eval-side timing channel (the reference's `time_inference` log,
    # models/llava.py:492)
    times = getattr(lm, "time_inference", None)
    if times:
        results["time_inference"] = {
            "total_s": float(sum(times)), "n_batches": len(times),
            "mean_s": float(sum(times) / len(times))}
    return results


def _rank_request_count(n_docs: int, rank: int, world_size: int) -> int:
    """How many docs land on `rank` under doc_id % world_size slicing."""
    return n_docs // world_size + (1 if rank < n_docs % world_size else 0)


def pad_uneven_ranks(task: ConfigurableTask, insts: list, rank: int,
                     world_size: int) -> list:
    """Pseudobatch padding (reference evaluator.py:276-296): when ranks
    receive uneven request counts, clone this rank's last request (marked
    `padded=True`, excluded from scoring) until every rank runs the same
    number — so multi-host collective inference never deadlocks. Our
    round-robin doc split makes every rank's count computable locally,
    so no gather is needed to agree on the target count."""
    import dataclasses as _dc

    n_docs = len(task.docs)
    max_count = max(_rank_request_count(n_docs, r, world_size)
                    for r in range(world_size))
    pads = []
    while insts and len(insts) + len(pads) < max_count:
        src = insts[-1]
        pads.append(_dc.replace(src, resps=[], filtered_resps={},
                                padded=True))
    return pads


def evaluate(lm, task_objs: Dict[str, ConfigurableTask], rank: int = 0,
             world_size: int = 1,
             return_id_experts: bool = False,
             bootstrap_iters: int = 1000) -> Dict[str, Any]:
    from .metrics import bootstrap_stderr, pooled_stderr

    # 1. build requests per task, rank-sliced, padded so every rank runs
    #    the same number (evaluator.py:257-296)
    requests_by_type: Dict[str, list] = {}
    for name, task in task_objs.items():
        insts = task.build_all_requests(rank=rank, world_size=world_size)
        pads = pad_uneven_ranks(task, insts, rank, world_size)
        task.instances.extend(pads)
        for inst in insts + pads:
            requests_by_type.setdefault(inst.request_type, []).append(inst)

    # 2. grouped dispatch (evaluator.py:300-301)
    for reqtype, reqs in requests_by_type.items():
        fn = getattr(lm, reqtype)
        fn(reqs, return_id_experts=return_id_experts)

    # 3. filters + scoring per task (+ bootstrap stderr)
    results: Dict[str, Any] = {"results": {}, "samples": {}, "groups": {}}
    group_members: Dict[str, list] = {}
    for name, task in task_objs.items():
        task.apply_filters()
        scores = task.score()
        for metric, vals in getattr(task, "sample_scores", {}).items():
            # corpus-level metrics (e.g. CIDEr) keep raw per-sample items;
            # bootstrap only applies to numeric per-sample scores
            numeric = all(isinstance(v, (int, float)) for v in vals)
            if metric in scores and bootstrap_iters > 0 and numeric:
                scores[f"{metric}_stderr"] = bootstrap_stderr(
                    vals, n_resamples=bootstrap_iters)
        results["results"][name] = scores
        if task.cfg.group:
            group_members.setdefault(task.cfg.group, []).append((name,
                                                                 task))
        samples = []
        for inst in task.instances:
            if inst.padded:
                continue
            rec = {"doc_id": inst.doc_id,
                   "resps": inst.resps,
                   "filtered": inst.filtered_resps.get("default")}
            if return_id_experts:
                rec["logs_metrics_vision"] = inst.logs_metrics_vision
                rec["logs_metrics_mlp"] = inst.logs_metrics_mlp
            samples.append(rec)
        results["samples"][name] = samples

    # 4. group aggregation: size-weighted mean over member tasks, pooled
    #    stderr (reference evaluator.py group handling)
    for group, members in group_members.items():
        agg: Dict[str, Any] = {}
        metrics = set()
        for name, task in members:
            metrics.update(getattr(task, "sample_scores", {}).keys())
        for metric in metrics:
            vals, errs, sizes = [], [], []
            for name, task in members:
                samples = getattr(task, "sample_scores", {}).get(metric)
                if not samples:
                    continue
                vals.append(results["results"][name][metric])
                errs.append(results["results"][name].get(
                    f"{metric}_stderr", 0.0))
                sizes.append(len(samples))
            if not vals:
                continue
            total = sum(sizes)
            agg[metric] = sum(v * n for v, n in zip(vals, sizes)) / total
            agg[f"{metric}_stderr"] = pooled_stderr(errs, sizes)
            agg["n_samples"] = total
        results["groups"][group] = agg
    return results


def make_table(results: Dict[str, Any]) -> str:
    """Plain-text results table (utils.py make_table role); stderr shown
    as +- next to its metric, groups appended below the tasks."""
    lines = [f"{'Task':<24} {'Metric':<16} {'Value':>10} {'Stderr':>9}"]
    lines.append("-" * 62)

    def emit(name, metrics):
        for metric, value in metrics.items():
            if metric.endswith("_stderr") or metric == "n_samples":
                continue
            err = metrics.get(f"{metric}_stderr")
            err_s = f"+-{err:7.4f}" if err is not None else ""
            lines.append(f"{name:<24} {metric:<16} {value:>10.4f} {err_s}")

    for task, metrics in results["results"].items():
        emit(task, metrics)
    for group, metrics in results.get("groups", {}).items():
        emit(f"[group] {group}", metrics)
    return "\n".join(lines)
