"""Multi-host initialization + mesh construction for pod-slice runs.

The reference is strictly single-node (SURVEY.md section 2.13: no
NCCL/MPI/Gloo anywhere); this module is the new TPU-native capability:
`jax.distributed` process bootstrap + a standard mesh factory so every
sharded entry point (parallel/pipeline.py, pipelines/pose_graph.py
mesh=..., parallel/solver.py) works unchanged from 1 chip to a pod slice.

Usage on each host of a slice:
    from open3d_tpu.parallel import multihost
    multihost.initialize()          # no-op off-cluster / single host
    mesh = multihost.make_mesh(("fragments",))
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running under a multi-host launcher.

    Resolution order: explicit args > standard env (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, as set by GKE/tpu-vm launchers) >
    TPU metadata auto-detect (jax.distributed.initialize() with no args).
    Returns True when a multi-process runtime was initialized; False for the
    single-process case (everything still works on the local devices)."""
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _env_int("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")
    if coordinator_address is None and num_processes is None:
        # single-process (or TPU-VM auto-detect explicitly requested via env)
        if os.environ.get("OPEN3D_TPU_AUTODETECT_DISTRIBUTED"):
            jax.distributed.initialize()
            _initialized = True
            return True
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def _env_int(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def make_mesh(
    axis_names: Sequence[str] = ("fragments",),
    axis_sizes: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Mesh over all (global) devices. With one axis, every device lands on
    it; with several, sizes must multiply to the device count (pass
    axis_sizes, or the first axis absorbs everything)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    assert int(np.prod(axis_sizes)) == n, (axis_sizes, n)
    arr = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))
