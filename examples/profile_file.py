#!/usr/bin/env python
"""Matrix-file profiling driver (ref experiments/profile_file.cpp /
profile_f binary): read a .mtx/.bin matrix, AMG setup, per-level matvec
profile, V-cycle breakdown, and a pCG solve report.

Usage: python examples/profile_file.py path/to/matrix.{mtx,bin} [--options f]
e.g.   python examples/profile_file.py \
           /root/reference/data/FloridaCollection/bcsstk16.mtx
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time

import numpy as np

from saena_tpu import AMG, Matrix, Options
from saena_tpu.amg import hierarchy as H
from saena_tpu.profiling import format_breakdown, profile_matvecs, vcycle_breakdown


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--options", default=None)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--max-iter", type=int, default=300)
    args = ap.parse_args(argv)

    opts = Options.from_file(args.options) if args.options else Options()

    A = Matrix()
    A.read_file(args.path)
    A.assemble()
    print(f"matrix: {A.get_num_rows()} rows, {A.get_nnz()} nnz")

    solver = AMG()
    t0 = time.time()
    solver.set_matrix(A, opts)
    print(f"Setup: {time.time() - t0:.3f} s")
    print(solver.info.table())

    print("\nper-level matvec profile (ref profile_matvecs):")
    for row in profile_matvecs(solver.hierarchy, n_iter=10):
        print(f"  lvl {row['level']}: {row['format']:<12} {row['time_us']:9.1f} us "
              f"{row['nnz_per_s']:.3e} nnz/s")

    params = H.SolveParams.from_options(opts)
    rhs_bd = np.zeros(solver.hierarchy.n_pad)
    rhs_bd[: solver.hierarchy.n] = 1.0
    bd = vcycle_breakdown(solver.hierarchy, params, rhs_bd, n_iter=10)
    print("\n" + format_breakdown(bd))

    rhs = A.csr @ np.ones(A.get_num_rows())
    solver.set_rhs(rhs)
    u, res = solver.solve_pCG(tol=args.tol, max_iter=args.max_iter)
    print(f"\npCG: iters={int(res.iters)} rel={float(res.rel_res):.3e} "
          f"true={float(res.true_res / res.init_res):.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
