#!/usr/bin/env python
"""3-D Poisson driver (ref experiments/Poisson.cpp): build the Laplacian,
remove boundary, AMG setup, warm + timed pCG solves, report convergence.

Usage: python examples/poisson.py [mx [my [mz]]] [--options file.{json,xml}]
       python examples/poisson.py 64            # 64^3
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time

import numpy as np

from saena_tpu import AMG, Matrix, Options, generators


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mx", nargs="?", type=int, default=32)
    ap.add_argument("my", nargs="?", type=int, default=0)
    ap.add_argument("mz", nargs="?", type=int, default=0)
    ap.add_argument("--options", default=None)
    ap.add_argument("--solves", type=int, default=10,
                    help="timed solves (after 5 warmups, ref Poisson.cpp:216)")
    args = ap.parse_args(argv)
    mx = args.mx
    my = args.my or mx
    mz = args.mz or mx

    opts = Options.from_file(args.options) if args.options else Options()
    opts = opts.replace(remove_boundary=True)  # ref Poisson.cpp:83

    A = Matrix()
    A.set_csr(generators.laplacian3D(mx, my, mz))
    A.assemble()
    rhs = generators.laplacian3D_set_rhs(mx, my, mz)

    solver = AMG()
    t0 = time.time()
    solver.set_matrix(A, opts)
    print(f"Setup: {time.time() - t0:.3f} s")
    print(solver.info.table())
    solver.set_rhs(rhs)

    u, res = solver.solve_pCG()
    print(f"\ninitial residual        = {float(res.init_res):e}")
    print(f"stopped at iteration    = {int(res.iters)}")
    print(f"final absolute residual = {float(res.final_res):e}")
    print(f"relative residual       = {float(res.rel_res):e}")
    print(f"true residual           = {float(res.true_res / res.init_res):e}")

    n_warm, n_timed = 5, args.solves
    for _ in range(n_warm):
        solver.solve_pCG()
    t0 = time.time()
    for _ in range(n_timed):
        u, res = solver.solve_pCG()
    print(f"\nSolve: {(time.time() - t0) / n_timed:.4f} s "
          f"(avg of {n_timed} after {n_warm} warmups)")

    u_exact = generators.laplacian3D_solution(mx, my, mz)
    err = np.abs(u - u_exact).max() / max(1e-300, np.abs(u_exact).max())
    print(f"error vs manufactured solution = {err:.3e} (O(h^2))")
    return 0


if __name__ == "__main__":
    sys.exit(main())
