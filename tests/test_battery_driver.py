"""Zero-shot battery driver (tools/run_zeroshot_battery.py): train a tiny
checkpoint, run the driver end-to-end, check the cached JSON + table."""

import pytest
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import run_zeroshot_battery as battery  # noqa: E402

pytestmark = pytest.mark.slow



def test_battery_driver_end_to_end(tmp_path):
    # 1. train 2 steps to produce a checkpoint
    from competesmoe_tpu.utils.argparser import ArgumentParser
    from competesmoe_tpu.train.lm_task import _task_args, get_task

    p = ArgumentParser()
    _task_args(p)
    common = [
        "-task", "synthetic_transformer", "-batch_size", "8",
        "-lm.unroll", "32", "-state_size", "32",
        "-transformer.encoder_n_layers", "2", "-moe.n_experts", "4",
        "-pkm.n_heads", "2", "-moe_name", "smoe", "-lm.vocab_size", "64",
        "-run_dir", str(tmp_path), "-valid_batches", "2",
    ]
    a = p.parse(common + ["-name", "bat", "-stop_after", "2",
                          "-save_interval", "2", "-log_interval", "1"])
    task = get_task("synthetic_transformer")(a)
    task.train()
    ckpts = sorted((tmp_path / "bat" / "checkpoint").glob("model-*"))
    assert ckpts, "no checkpoint written"
    ckpt = ckpts[-1]

    # 2. a tiny lambada file for the battery
    lam = tmp_path / "lambada.jsonl"
    lam.write_text(json.dumps({"text": "a b c d"}) + "\n")

    # 3. driver over the checkpoint — the subprocess must see the same
    # device topology the checkpoint was saved with (the 8-device CPU
    # mesh the conftest forces in-process)
    import os
    os.environ["COMPETESMOE_PLATFORM"] = "cpu"
    extra = " ".join(common + ["-lm.eval.lambada.path", str(lam)])
    results = battery.main([
        "--checkpoints", str(ckpt), "--tests", "lambada",
        "--extra-args", extra])
    res = results[ckpt.name]
    assert "valid/perplexity" in res
    assert any("lambada" in k for k in res), res

    # cached result file exists and reruns hit the cache
    cache = ckpt.parent / f"result_competition_{ckpt.name}.json"
    assert cache.exists()
    again = battery.run_checkpoint(ckpt, ["lambada"], extra)
    assert again == res

    table = battery.make_table(results)
    assert "valid/perplexity" in table and ckpt.name in table
