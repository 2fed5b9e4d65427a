"""Multi-host initialization + mesh construction.

Replaces the reference's MPI bootstrap (parallel_context.cpp:76-96: MPI_Init
+ oneCCL KVS broadcast + TP_LOCAL_SIZE shm detection) with
``jax.distributed`` (DCN bootstrap) and a mesh laid out so tensor-parallel
collectives ride ICI within a host/slice and only data-parallel traffic
crosses DCN.

Usage on each host of a multi-host slice (or GPU-style cluster):

    from neural_tpu.parallel.multihost import init_distributed, auto_mesh
    init_distributed(coordinator="host0:1234", num_processes=N, process_id=i)
    mesh = auto_mesh(tp=8)     # tp within a host, dp across hosts
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """jax.distributed bootstrap. On TPU pods with the standard launcher,
    all arguments are auto-detected (call with no args). Explicit args
    support manual/GPU-style bringup (the mpirun analog)."""
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def auto_mesh(tp: Optional[int] = None, dp: Optional[int] = None) -> Mesh:
    """Devices → ("dp", "tp") mesh with tp contiguous over local devices
    (ICI) and dp spanning hosts (DCN) — the layout that keeps the per-layer
    allreduces (llama.cpp:592,693 analog) off the slow network."""
    devices = jax.devices()
    n = len(devices)
    local = jax.local_device_count()
    if tp is None:
        tp = min(local, n)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, (dp, tp, n)
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def is_primary() -> bool:
    """reference: is_master (parallel_context.h:43)."""
    return jax.process_index() == 0
