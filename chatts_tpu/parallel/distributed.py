"""Multi-host initialization and DP request sharding.

TPU-native counterpart of the reference's distributed launch layer
(reference: chatts/utils/inference_tsmllm_deepspeed.py:37-41 — NCCL process
group + DeepSpeed init; SURVEY §2.5): ``jax.distributed.initialize`` wires
hosts over DCN, the mesh spans every chip, and request sharding follows the
reference's ``idx % world_size == rank`` convention.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID; on Cloud TPU all three
    are auto-detected and may be omitted)."""
    kwargs = {}
    if coordinator_address or os.environ.get("COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["COORDINATOR_ADDRESS"]
        )
    if num_processes or os.environ.get("NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["NUM_PROCESSES"]
        )
    if process_id is not None or os.environ.get("PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None else os.environ["PROCESS_ID"]
        )
    jax.distributed.initialize(**kwargs)


def process_info() -> tuple:
    """(process_index, process_count) — (0, 1) when not distributed."""
    return jax.process_index(), jax.process_count()


def shard_indices(n: int, rank: Optional[int] = None,
                  world: Optional[int] = None) -> Sequence[int]:
    """The reference's sample sharding: indices with i % world == rank
    (reference: inference_tsmllm_deepspeed.py:66-68)."""
    if rank is None or world is None:
        rank, world = process_info()
    return [i for i in range(n) if i % world == rank]
