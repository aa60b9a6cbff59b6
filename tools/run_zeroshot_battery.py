"""Downstream zero-shot battery driver over saved checkpoints.

Re-design of `moe_pretrain_model/paper/moe_universal/run_tests.py:14-58`:
for each checkpoint, shell the trainer in test-only mode with the QA
battery enabled, capture the JSON metrics line, cache it next to the
checkpoint, and print a task x checkpoint results table.

  python tools/run_zeroshot_battery.py \
      --checkpoints runs/a/checkpoint runs/b/checkpoint \
      --tests lambada,hellaswag,piqa,blimp,ai2arc,cbt \
      [--extra-args "-task chunked_transformer -lm.data_dir chunks"]

Results cache as `result_competition_<ckpt>.json` (the reference's
naming) so reruns skip finished checkpoints.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

RESULT_NAME = "result_competition"


def run_checkpoint(ckpt: Path, tests: list, extra_args: str,
                   batch_size=None, force=False) -> dict:
    res_path = ckpt.parent / f"{RESULT_NAME}_{ckpt.name}.json"
    if res_path.is_file() and not force:
        return json.loads(res_path.read_text())

    cmd = [sys.executable, "-m", "competesmoe_tpu.cli.main",
           "-name", "post_validate", "-restore", str(ckpt),
           "-test_only", "1", "-lm.eval.enabled", "1"]
    for t in tests:
        cmd += [f"-lm.eval.{t}.enabled", "1"]
    if batch_size:
        cmd += ["-batch_size", str(batch_size)]
    cmd += extra_args.split()
    print("Validate command:", " ".join(cmd), file=sys.stderr)
    out = subprocess.run(cmd, capture_output=True, text=True,
                         cwd=os.getcwd())
    if out.returncode != 0:
        raise RuntimeError(
            f"{ckpt}: validate failed rc={out.returncode}\n"
            f"{out.stderr[-2000:]}")
    # the metrics JSON is the last line that parses as a dict
    res = None
    for line in reversed(out.stdout.splitlines()):
        try:
            cand = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(cand, dict):
            res = cand
            break
    if res is None:
        raise RuntimeError(f"{ckpt}: no JSON metrics line in output")
    res_path.write_text(json.dumps(res, indent=1))
    return res


def make_table(results: dict) -> str:
    metrics = sorted({m for r in results.values() for m in r})
    w = max((len(m) for m in metrics), default=10) + 2
    lines = [" " * w + "  ".join(f"{k:>12}" for k in results)]
    for m in metrics:
        row = f"{m:<{w}}"
        for r in results.values():
            v = r.get(m)
            row += f"{v:>12.4f}  " if isinstance(v, (int, float)) \
                else f"{'-':>12}  "
        lines.append(row)
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoints", nargs="+", required=True)
    ap.add_argument("--tests",
                    default="lambada,cbt,hellaswag,piqa,blimp,ai2arc",
                    help="comma list of -lm.eval.<name> batteries "
                         "(run_tests.py TESTS)")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--extra-args", default="",
                    help="extra trainer flags (task/data dirs)")
    ap.add_argument("--force", action="store_true",
                    help="ignore cached result files")
    a = ap.parse_args(argv)

    results = {}
    for c in a.checkpoints:
        ckpt = Path(c)
        results[ckpt.name] = run_checkpoint(
            ckpt, a.tests.split(","), a.extra_args, a.batch_size,
            force=a.force)
    print(make_table(results))
    return results


if __name__ == "__main__":
    main()
