"""Real multi-process runtime smoke (VERDICT r3 item 5).

All other tests run single-process on 8 virtual devices;
tools/multiprocess_smoke.py is the one place jax.distributed.initialize,
the global mesh, make_array_from_callback placement, and the
merge_rank_results file gather cross an actual OS process boundary
(reference analog: SLURM/torchrun NCCL bootstrap,
moe_pretrain_model/framework/helpers/distributed.py:148-203).
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow


def test_two_process_train_and_eval_merge():
    tool = Path(__file__).parent.parent / "tools" / "multiprocess_smoke.py"
    proc = subprocess.run([sys.executable, str(tool)], text=True,
                          capture_output=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    last = [json.loads(l) for l in proc.stdout.splitlines()
            if l.startswith("{")][-1]
    assert last["metric"] == "multiprocess_smoke" and last["value"] == 1
    d = last["detail"]
    assert len(d["worker_losses"]) == 2
    assert d["merged"]["merged_ranks"] == 2
