#!/usr/bin/env python
"""SpGEMM benchmark driver (ref experiments/gemm.cpp + test sweep scripts
test_parallel_range_matmat_random.py): C = A @ B on random symmetric
matrices over a density sweep, timed after warmups, verified vs scipy.

Usage: python examples/gemm.py [M] [--densities 0.001,0.01] [--devices N]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time

import numpy as np

from saena_tpu import generators
from saena_tpu.ops.spgemm import matmat
from saena_tpu.parallel.sharded import make_mesh
from saena_tpu import oracles


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("M", nargs="?", type=int, default=5000)
    ap.add_argument("--densities", default="0.001,0.005,0.01")
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=10)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    mesh = make_mesh(args.devices)
    D = mesh.devices.size
    print(f"mesh: {D} device(s)")

    for dens in [float(d) for d in args.densities.split(",")]:
        A = generators.random_symm_matrix(args.M, dens, seed=1)
        B = generators.random_symm_matrix(args.M, dens, seed=2)
        # warmups then timed loop (ref setup_matmat.cpp:1178-1180:
        # avg of 20 iters after 10 warmups)
        C = matmat(A, B, mesh, dtype=jnp.float32)
        err = oracles.check_matmat(A, B, C)
        for _ in range(args.warmup):
            matmat(A, B, mesh, dtype=jnp.float32, assemble=False)
        t0 = time.time()
        for _ in range(args.iters):
            blocks, _ = matmat(A, B, mesh, dtype=jnp.float32, assemble=False)
        np.asarray(blocks[0, 0, 0])  # sync
        dt = (time.time() - t0) / args.iters
        flops = 2.0 * A.nnz * (B.nnz / args.M)  # ~ 2 * nnz_A * avg row nnz_B
        print(f"density={dens:8.4f} nnzA={A.nnz:10d} matmat={dt * 1e3:9.3f} ms "
              f"(~{flops / dt / 1e9:.1f} GFLOP/s eff)  max_err_vs_scipy={err:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
