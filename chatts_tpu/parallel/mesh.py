"""Device mesh construction.

TPU-native replacement for the reference's NCCL/vLLM-TP/DeepSpeed process
topology (reference: chatts/utils/inference_tsmllm_deepspeed.py:40-41,
llm_utils.py:252-266; SURVEY §2.5): one ``jax.sharding.Mesh`` with a data
axis (across hosts / DCN) and a model axis (within a slice / ICI), and XLA
owns every collective.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "tp"


def create_mesh(
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, tp) mesh.

    Defaults: all devices on the model axis (tp), one data replica — the
    right default for one 8/14B model on a v5e-8 slice.  The device order
    follows ``jax.devices()``, which keeps ICI neighbors adjacent so the tp
    axis rides ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = 1, n
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp."""
    return NamedSharding(mesh, P(DATA_AXIS))
