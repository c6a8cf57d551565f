#!/usr/bin/env python
"""Lazy-update driver (ref experiments/lazy.cpp): time-dependent problem
where A's values change each step but the pattern is fixed — update1/2/3
refresh the hierarchy without re-aggregating.

Usage: python examples/lazy.py [m] [--steps N]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time

import numpy as np

from saena_tpu import AMG, Matrix, Options, generators
from saena_tpu.core.coo import remove_boundary_nodes


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("m", nargs="?", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args(argv)
    m = args.m

    base = generators.laplacian3D(m, m, m)
    rhs0 = generators.laplacian3D_set_rhs(m, m, m)
    A0, interior, bound, bdiag, rhs = remove_boundary_nodes(base, rhs0)

    A = Matrix()
    A.set_csr(A0)
    A.assemble()
    solver = AMG()
    t0 = time.time()
    solver.set_matrix(A, Options())
    print(f"initial setup: {time.time() - t0:.3f} s "
          f"({solver.hierarchy.n_levels} levels)")
    solver.set_rhs(rhs)
    u, res = solver.solve_pCG()
    print(f"step 0: iters={int(res.iters)} rel={float(res.rel_res):.2e}")

    for step in range(1, args.steps + 1):
        # time-dependent coefficient: values scale, pattern fixed
        Anew_csr = A0.copy()
        Anew_csr.data = Anew_csr.data * (1.0 + 0.3 * step)
        Anew = Matrix()
        Anew.set_csr(Anew_csr)
        Anew.assemble()

        t0 = time.time()
        solver.update2(Anew)         # recompute Ac through existing P/R
        dt = time.time() - t0
        u, res = solver.solve_pCG()
        r = rhs - Anew_csr @ u
        print(f"step {step}: update2={dt:.3f}s iters={int(res.iters)} "
              f"true_rel={np.linalg.norm(r) / np.linalg.norm(rhs):.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
