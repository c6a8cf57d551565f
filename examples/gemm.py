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

    from functools import partial

    from saena_tpu.ops.spgemm import matmat_prepare, matmat_run

    # per-iteration time via the slope of two chained-loop lengths with a
    # single value-fetch sync — on tunneled TPU only value fetches
    # synchronize and each costs ~26 ms RPC (see bench.py); the 1e-30*s
    # scale of B makes each iteration depend on the carry so XLA cannot
    # hoist the loop-invariant product
    @partial(jax.jit, static_argnames=("n",))
    def chain(Ab, Bb, n):
        def body(i, s):
            C = matmat_run(Ab, Bb * (1.0 + 1e-30 * s), mesh)
            return s + C[0, 0, 0] * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), Ab.dtype))

    def slope(Ab, Bb, n_long):
        float(chain(Ab, Bb, 3)); float(chain(Ab, Bb, n_long))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter(); float(chain(Ab, Bb, 3))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter(); float(chain(Ab, Bb, n_long))
            tl = time.perf_counter() - t0
            reps.append((tl - ts) / (n_long - 3))
        return float(np.median(reps))

    for dens in [float(d) for d in args.densities.split(",")]:
        A = generators.random_symm_matrix(args.M, dens, seed=1)
        B = generators.random_symm_matrix(args.M, dens, seed=2)
        C = matmat(A, B, mesh, dtype=jnp.float32)      # correctness pass
        err = oracles.check_matmat(A, B, C)
        # device-resident operands: host distribution is NOT in the timed
        # region (the reference too distributes/compress_preps before its
        # 20-iteration timed loop, setup_matmat.cpp:1164-1360)
        Ab, Bb, _ = matmat_prepare(A, B, mesh, dtype=jnp.float32)
        dt = slope(Ab, Bb, max(args.iters, 10))
        flops_s = 2.0 * A.nnz * (B.nnz / args.M)       # sparse-effective
        flops_d = 2.0 * float(args.M) ** 3             # dense-strategy
        print(f"density={dens:8.4f} nnzA={A.nnz:10d} matmat={dt * 1e3:9.3f} ms "
              f"({flops_d / dt / 1e12:.1f} TFLOP/s dense, "
              f"{flops_s / dt / 1e9:.2f} GFLOP/s sparse-eff)  "
              f"max_err_vs_scipy={err:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
