#!/usr/bin/env python
"""Shard-parallel setup driver: serial vs distributed hierarchy build.

The reference runs its whole setup rank-distributed under MPI
(saena_object_setup1/2.cpp); here the same decomposition runs as
per-shard row-block tasks with metered halo exchanges
(saena_tpu/parallel/dist_setup.py) and must reproduce the serial
hierarchy BIT FOR BIT. This driver builds both, checks the identity,
and prints wall times plus the per-phase wire volume an MPI/DCN
transport would carry.

Usage: python examples/dist_setup.py [m] [--shards N] [--codec gr|none]
       python examples/dist_setup.py 48 --shards 8
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np

from saena_tpu.amg import hierarchy as H
from saena_tpu.config import Options
from saena_tpu.core.coo import remove_boundary_nodes
from saena_tpu.generators import laplacian3D, laplacian3D_set_rhs
from saena_tpu.parallel.dist_setup import dist_setup


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("m", nargs="?", type=int, default=32)
    ap.add_argument("--shards", type=int, default=0,
                    help="row shards (0 = one per core)")
    ap.add_argument("--codec", default="gr", choices=("gr", "none"),
                    help="wire codec for remote SpGEMM windows")
    args = ap.parse_args(argv)

    m = args.m
    A0 = laplacian3D(m, m, m)
    rhs0 = laplacian3D_set_rhs(m, m, m)
    A, _, _, _, rhs = remove_boundary_nodes(A0, rhs0)
    A = A.tocsr()
    opts = Options()
    print(f"3-D Poisson {m}^3: n={A.shape[0]}, nnz={A.nnz}")

    t0 = time.perf_counter()
    _, i_ser = H.setup(A, opts)
    t_ser = time.perf_counter() - t0
    print(f"serial setup      {t_ser:8.2f} s   levels={i_ser.sizes}")

    t0 = time.perf_counter()
    _, i_dist = dist_setup(A, opts, n_shards=args.shards,
                           wire_codec=args.codec)
    t_dist = time.perf_counter() - t0
    print(f"dist setup        {t_dist:8.2f} s   "
          f"(x{t_ser / max(t_dist, 1e-9):.2f} vs serial)")

    same = i_ser.sizes == i_dist.sizes and all(
        np.array_equal(X.data, Y.data)
        and np.array_equal(X.indices, Y.indices)
        for X, Y in zip(i_ser.csr_levels, i_dist.csr_levels))
    print(f"bitwise identical hierarchy: {same}")
    print("-- setup wire volume (per phase) --")
    print(i_dist.comm.table())
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
