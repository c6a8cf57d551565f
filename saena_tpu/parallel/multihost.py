"""Multi-host execution helpers.

The reference scales across nodes purely through MPI ranks; the TPU-native
equivalent is `jax.distributed.initialize` + a mesh spanning all hosts'
devices — the SAME shard_map code paths then run over ICI within a slice
and DCN across hosts, with XLA routing the collectives (SURVEY.md §2.5/9).

Typical multi-host launch (one process per host):

    from saena_tpu.parallel.multihost import init_distributed, global_mesh
    init_distributed(coordinator, num_processes, process_id)
    mesh = global_mesh()                      # 1-D mesh over ALL devices
    sh, splits = shard_hierarchy(info, opts, mesh)
    u, *_ = sharded_solve_pCG(sh, splits, rhs, mesh)

Weak-scaling measurement (config 5 in BASELINE.md) reuses bench-style slope
timing on the global mesh; scaling efficiency = nnz/s(N devices) /
(N * nnz/s(1 device)).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (auto-detects on supported TPU deployments
    when called with no arguments)."""
    import jax

    kw = {}
    if coordinator_address is not None:
        kw = dict(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)


def global_mesh(axis: str = "d"):
    """1-D mesh over every device of every host."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def scaling_efficiency(nnz_per_s_n: float, nnz_per_s_1: float,
                       n_devices: int) -> float:
    """>= 0.8 is the BASELINE.md multi-host target."""
    return nnz_per_s_n / (n_devices * nnz_per_s_1)
