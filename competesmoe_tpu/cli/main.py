"""Pretraining entry point.

Re-design of `moe_pretrain_model/main.py`: parse dotted flags, look up the
task, restore-or-train. `python -m competesmoe_tpu.cli.main -task
synthetic_transformer -stop_after 100 ...`.
"""

from __future__ import annotations

import json
import sys


def main(argv=None) -> None:
    import os

    from ..train.lm_task import get_task
    from ..utils.argparser import build_parser

    # COMPETESMOE_PLATFORM=cpu forces the CPU backend before first use —
    # needed because the container sitecustomize pins the TPU platform at
    # interpreter start, so JAX_PLATFORMS alone is ignored (e.g. when a
    # validate subprocess must match a CPU-mesh checkpoint's topology)
    platform = os.environ.get("COMPETESMOE_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    cache_dir = os.environ.get("COMPETESMOE_COMPILATION_CACHE")
    if cache_dir:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    parser = build_parser()
    a = parser.parse(argv)
    if a.nan_detect:
        import jax
        jax.config.update("jax_debug_nans", True)
    task_cls = get_task(a.task)
    t = task_cls(a)
    if a.test_only:
        res = t.test()
        print(json.dumps(res))
    else:
        t.train()


if __name__ == "__main__":
    main()
