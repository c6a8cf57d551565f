"""Two-process jax.distributed CPU test (VERDICT r1 #6): the sharded solve
runs over a GLOBAL mesh spanning two OS processes (4 virtual devices each),
with gloo carrying the cross-process collectives — the CPU stand-in for a
multi-host TPU deployment, and the analog of the reference's `mpirun -np P`
test discipline (/root/reference/test/test_parallel.py)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def test_two_process_pcg_parity():
    port = "12517"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-3000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))

    # both processes agree (they ran the SAME global program)
    assert results[0]["iters"] == results[1]["iters"]
    assert results[0]["rfin"] == pytest.approx(results[1]["rfin"])
    assert results[0]["rel_true"] < 1e-7

    # iteration parity with the single-process 8-device run
    import jax
    import saena_tpu.amg.hierarchy as H
    from saena_tpu.config import Options
    from saena_tpu.core.coo import remove_boundary_nodes
    from saena_tpu.generators import laplacian3D, laplacian3D_set_rhs
    from saena_tpu.parallel.sharded import (
        make_mesh, shard_hierarchy, sharded_solve_pCG)

    A0 = laplacian3D(16, 16, 16)
    rhs0 = laplacian3D_set_rhs(16, 16, 16)
    A, _, _, _, rhs = remove_boundary_nodes(A0, rhs0)
    opts = Options(replicate_threshold=500)
    hier, info = H.setup(A, opts)
    mesh = make_mesh(8)
    sh, splits = shard_hierarchy(info, opts, mesh)
    _, iters, r0, rfin, _ = sharded_solve_pCG(
        sh, splits, rhs, mesh, params=H.SolveParams.from_options(opts),
        tol=1e-8, max_iter=100)
    assert results[0]["iters"] == iters
    assert results[0]["r0"] == pytest.approx(r0, rel=1e-10)
