"""2-process distributed smoke: REAL process boundaries for the runtime.

The reference trains under SLURM/torchrun with NCCL process groups
(moe_pretrain_model/framework/helpers/distributed.py:148-203); our
analog is `parallel.distributed.initialize` -> one global JAX mesh. All
regular tests run single-process on 8 virtual devices, so this tool is
the one place the multi-host code path actually crosses an OS process
boundary (VERDICT r3 item 5):

1. parent computes a solo oracle: one fsdp+EP LM train-step loss on its
   own 8-device mesh;
2. parent spawns 2 workers (torchrun-style RANK/WORLD_SIZE/MASTER_*
   env). Each worker: `detect_env()` -> `jax.distributed.initialize`
   (Gloo CPU collectives), 4 local + 8 global devices, params placed
   with `make_array_from_callback` (the multi-host-safe `put_batch`
   path), ONE jitted train step over the GLOBAL mesh -> prints loss;
3. both workers also run `simple_evaluate(rank=r, world_size=2,
   merge_dir=...)` on a tiny VQA task — the file-based cross-rank merge
   (`eval.evaluator.merge_rank_results`) now exercised across real
   processes; parent asserts rank 0's merged metric equals its own solo
   eval.

Exit 0 = losses match the oracle and the merged metric matches solo.
Run:  python tools/multiprocess_smoke.py        (takes ~2-4 min on CPU)
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _setup_jax(n_local: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    return jax


def _lm_pieces():
    import jax
    from competesmoe_tpu.models.lm import (
        LMConfig,
        MoELanguageModel,
        lm_loss_fn,
    )
    from competesmoe_tpu.moe import MoEArgs

    cfg = LMConfig(vocab_size=256, d_model=64, n_layers=2, n_heads=2,
                   n_experts=8, expert_size=16, moe_topk=2,
                   moe_name="smoe", moe_args=MoEArgs())
    model = MoELanguageModel(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (8, 17), 0, 256)

    def loss_fn(p, toks):
        logits, aux = model.apply({"params": p}, toks[:, :-1], train=True)
        ce, _ = lm_loss_fn(logits, toks[:, 1:])
        return ce + aux["total_aux_loss"]

    params = model.init(jax.random.PRNGKey(1), tokens[:, :-1])["params"]
    return loss_fn, params, tokens


def _global_step_loss():
    """One loss+grad step on a global fsdp+EP mesh (works single- or
    multi-process: params placed via make_array_from_callback)."""
    import jax
    import numpy as np
    from competesmoe_tpu.parallel import make_mesh, make_param_shardings
    from competesmoe_tpu.parallel.mesh import batch_sharding, put_batch

    loss_fn, params, tokens = _lm_pieces()
    mesh = make_mesh(n_expert=2)
    with mesh:
        shardings = make_param_shardings(mesh, params, fsdp=True,
                                         fsdp_min_size=1024)
        params = jax.tree_util.tree_map(
            lambda leaf, sh: jax.make_array_from_callback(
                np.asarray(leaf).shape, sh,
                lambda idx, a=np.asarray(leaf): a[idx]),
            params, shardings)
        toks = put_batch(np.asarray(tokens), mesh, batch_sharding(mesh))
        val = jax.jit(jax.value_and_grad(loss_fn))(params, toks)[0]
        return float(val)


def _tiny_eval(rank: int, world_size: int, merge_dir):
    import jax
    import numpy as np
    from PIL import Image

    from competesmoe_tpu.eval import (
        JaxLlava,
        TaskConfig,
        register_task,
        simple_evaluate,
    )
    from competesmoe_tpu.models.llava import LlavaModel
    from competesmoe_tpu.multimodal.mm_utils import ImageProcessorConfig
    from test_eval_harness import EvalTok
    from test_llava import tiny_llava_cfg

    docs = [{"q": f"what color is this {i}", "a": "red",
             "img": Image.new("RGB", (30, 30), (255, 0, 0))}
            for i in range(5)]
    register_task("mp_vqa", TaskConfig(
        task="mp_vqa", output_type="generate_until",
        doc_to_text=lambda d: d["q"],
        doc_to_visual=lambda d: [d["img"]],
        doc_to_target=lambda d: d["a"],
        generation_kwargs={"max_new_tokens": 3},
        metric_list=[{"metric": "exact_match", "aggregation": "mean"}],
        docs=docs))
    cfg = tiny_llava_cfg(moe=True)
    model = LlavaModel(cfg)
    tok = EvalTok()
    tok("what color is this yes red blue a cat")
    ids = np.full((1, 6), 2, np.int32)
    px = np.zeros((1, 28, 28, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, px)["params"]
    lm = JaxLlava(model, params, tok, ImageProcessorConfig(size=28),
                  batch_size=2, max_new_tokens=3)
    if world_size == 1:
        return simple_evaluate(lm, ["mp_vqa"])
    return simple_evaluate(lm, ["mp_vqa"], rank=rank,
                           world_size=world_size, merge_dir=merge_dir)


def worker(merge_dir: str):
    _setup_jax(4)
    import jax

    from competesmoe_tpu.parallel.distributed import detect_env, initialize

    denv = initialize(detect_env())
    assert denv.is_distributed, "worker must see RANK/WORLD_SIZE"
    print(json.dumps({"role": "worker", "rank": denv.rank,
                      "local_devices": jax.local_device_count(),
                      "global_devices": jax.device_count()}), flush=True)
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    loss = _global_step_loss()
    print(json.dumps({"rank": denv.rank, "train_loss": loss}), flush=True)

    res = _tiny_eval(denv.rank, 2, merge_dir)
    if denv.rank == 0:
        print(json.dumps({
            "rank": 0, "merged_ranks": res.get("merged_ranks"),
            "merged_exact_match":
                res["results"]["mp_vqa"]["exact_match"],
            "n_samples": len(res["samples"]["mp_vqa"])}), flush=True)


def parent():
    _setup_jax(8)
    oracle_loss = _global_step_loss()
    oracle_eval = _tiny_eval(0, 1, None)
    oracle_em = oracle_eval["results"]["mp_vqa"]["exact_match"]
    print(json.dumps({"role": "parent", "oracle_loss": oracle_loss,
                      "oracle_exact_match": oracle_em}), flush=True)

    merge_dir = tempfile.mkdtemp(prefix="mp_merge_")
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # workers set their own device count
        env.update(RANK=str(rank), WORLD_SIZE="2",
                   MASTER_ADDR="127.0.0.1", MASTER_PORT="12731",
                   PYTHONPATH=os.pathsep.join(
                       [REPO, os.path.join(REPO, "tests")]
                       + env.get("PYTHONPATH", "").split(os.pathsep)))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--merge-dir", merge_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(out)
            raise SystemExit(f"rank {rank} failed rc={p.returncode}")

    losses, merged = {}, None
    for out in outs:
        for line in out.splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if "train_loss" in rec:
                losses[rec["rank"]] = rec["train_loss"]
            if "merged_exact_match" in rec:
                merged = rec

    ok = (len(losses) == 2
          and all(abs(v - oracle_loss) < 1e-4 * max(1.0, abs(oracle_loss))
                  for v in losses.values())
          and merged is not None and merged["merged_ranks"] == 2
          and merged["n_samples"] == 5
          and abs(merged["merged_exact_match"] - oracle_em) < 1e-9)
    print(json.dumps({
        "metric": "multiprocess_smoke", "value": 1 if ok else 0,
        "unit": "ok",
        "detail": {"oracle_loss": oracle_loss, "worker_losses": losses,
                   "oracle_exact_match": oracle_em, "merged": merged}}))
    raise SystemExit(0 if ok else 1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--merge-dir", default="")
    a = ap.parse_args(argv)
    if a.worker:
        worker(a.merge_dir)
    else:
        parent()


if __name__ == "__main__":
    main()
