#!/usr/bin/env python
"""Helmholtz2D p-coarsening driver (config 4; ref saena_object_pcoarsen_modal.cpp).

Reads a bundled high-order modal matrix + its Nektar session XML, derives
the modal-unit layout (interior edges x NUMMODES), builds the injection
p-level chain (order drops by 1 per level until 1, then h-coarsening takes
over), and compares p+h multigrid against h-only.

Usage: python examples/helmholtz_pcoarsen.py [P]      # P in 2..5, default 5
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np

from saena_tpu import AMG, Matrix, Options
from saena_tpu.amg.pcoarsen import detect_modal_blocks, modal_block_plevels
from saena_tpu.io.nektar import read_nektar
from saena_tpu.io.readers import read_bin

REF = "/root/reference/data/Helmholtz2D_CG_curved_tri"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("p", nargs="?", type=int, default=5, choices=(2, 3, 4, 5))
    ap.add_argument("--data", default=REF)
    args = ap.parse_args(argv)

    stem = f"{args.data}/Helmholtz2D_CG_P{args.p}_Modes_curved_tri"
    A_csr = read_bin(stem + ".bin")
    mesh = read_nektar(stem + ".xml")
    n = A_csr.shape[0]
    n_units = detect_modal_blocks(A_csr, args.p)
    print(f"P{args.p}: n={n} nnz={A_csr.nnz} | mesh: "
          f"{len(mesh.vert_ids)} verts, {len(mesh.edge_ids)} edges "
          f"({mesh.boundary_edges.size} boundary), {len(mesh.tri_ids)} tris; "
          f"{n_units} modal units x NUMMODES={args.p} "
          f"(basis {mesh.basis_type})")
    assert n_units == mesh.interior_edges.size

    rhs = A_csr @ np.ones(n)
    opts = Options(least_row_threshold=20)

    for label, plv in [("h-only", None),
                       ("p+h   ", modal_block_plevels(n_units, args.p))]:
        A = Matrix()
        A.set_csr(A_csr)
        A.assemble()
        solver = AMG()
        t0 = time.perf_counter()
        solver.set_matrix(A, opts, p_levels=plv)
        setup_s = time.perf_counter() - t0
        solver.set_rhs(rhs)
        u, res = solver.solve_pCG()
        rel = np.linalg.norm(rhs - A_csr @ u) / np.linalg.norm(rhs)
        kinds = ",".join(solver.info.coarsen_kinds)
        print(f"{label}: iters={int(res.iters):3d} rel={rel:.2e} "
              f"setup={setup_s:.2f}s levels={solver.info.sizes} [{kinds}]")


if __name__ == "__main__":
    main()
