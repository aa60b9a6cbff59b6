"""Multi-host runtime initialization.

Re-design of `moe_pretrain_model/framework/helpers/distributed.py:10-220`
(SLURMEnv/LocalEnv + NCCL process groups): on TPU a single
`jax.distributed.initialize` replaces the whole NCCL bootstrap — the mesh
then spans all hosts' devices and XLA routes collectives over ICI/DCN.

Env detection mirrors the reference: SLURM variables first, then
torchrun-style vars, then single-process.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class DistributedEnv:
    rank: int = 0
    world_size: int = 1
    local_rank: int = 0
    coordinator: Optional[str] = None
    is_slurm: bool = False
    is_preemptible: bool = False
    restart_count: int = 0

    @property
    def is_distributed(self) -> bool:
        return self.world_size > 1

    @property
    def is_master(self) -> bool:
        return self.rank == 0


def detect_env() -> DistributedEnv:
    env = os.environ
    if "SLURM_PROCID" in env:  # SLURMEnv (distributed.py:40-140)
        nodelist = env.get("SLURM_JOB_NODELIST", "localhost")
        head = nodelist.split(",")[0].replace("[", "").split("-")[0]
        return DistributedEnv(
            rank=int(env["SLURM_PROCID"]),
            world_size=int(env.get("SLURM_NTASKS", 1)),
            local_rank=int(env.get("SLURM_LOCALID", 0)),
            coordinator=f"{head}:{env.get('MASTER_PORT', '12355')}",
            is_slurm=True,
            is_preemptible="SLURM_RESTART_COUNT" in env,
            restart_count=int(env.get("SLURM_RESTART_COUNT", 0)))
    if "RANK" in env and "WORLD_SIZE" in env:  # LocalEnv / torchrun-style
        return DistributedEnv(
            rank=int(env["RANK"]), world_size=int(env["WORLD_SIZE"]),
            local_rank=int(env.get("LOCAL_RANK", 0)),
            coordinator=f"{env.get('MASTER_ADDR', '127.0.0.1')}:"
                        f"{env.get('MASTER_PORT', '12355')}")
    return DistributedEnv()


def initialize(denv: Optional[DistributedEnv] = None) -> DistributedEnv:
    """Initialize the JAX multi-host runtime when needed (idempotent for
    world_size 1)."""
    denv = denv or detect_env()
    if denv.is_distributed:
        import jax
        jax.distributed.initialize(
            coordinator_address=denv.coordinator,
            num_processes=denv.world_size, process_id=denv.rank)
    return denv


def run_identifier(denv: Optional[DistributedEnv] = None) -> str:
    """Stable id for this scheduler job (the reference's
    dist_env.get_run_identifier(), used to key job records for
    preemption auto-resume, training_helper.py:159-182)."""
    env = os.environ
    if "SLURM_JOB_ID" in env:
        return f"slurm-{env['SLURM_JOB_ID']}"
    if "JOB_ID" in env:
        return f"job-{env['JOB_ID']}"
    return "local"


def is_restart(denv: Optional[DistributedEnv] = None) -> bool:
    denv = denv or detect_env()
    return denv.restart_count > 0
