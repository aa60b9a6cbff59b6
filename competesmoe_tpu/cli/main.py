"""Pretraining entry point.

Re-design of `moe_pretrain_model/main.py`: parse dotted flags, look up the
task, restore-or-train. `python -m competesmoe_tpu.cli.main -task
synthetic_transformer -stop_after 100 ...`.
"""

from __future__ import annotations

import json
import sys


def main(argv=None) -> None:
    from ..train.lm_task import get_task
    from ..utils.argparser import build_parser

    parser = build_parser()
    a = parser.parse(argv)
    task_cls = get_task(a.task)
    t = task_cls(a)
    if a.test_only:
        res = t.test()
        print(json.dumps(res))
    else:
        t.train()


if __name__ == "__main__":
    main()
