#!/usr/bin/env python
"""Weak-scaled 3-D Poisson across the mesh (config 5 of BASELINE.md):
constant work per device, SpMV nnz/s and pCG solve time vs device count,
with compressed halo exchange. On multi-host deployments run one process
per host after saena_tpu.parallel.multihost.init_distributed().

Usage: python examples/weak_scaling.py [--per-device 16] [--devices 1,2,4,8]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time
from functools import partial

import numpy as np

from saena_tpu.config import Options
from saena_tpu.amg import hierarchy as H
from saena_tpu.core.coo import remove_boundary_nodes
from saena_tpu.generators import laplacian3D, laplacian3D_set_rhs
from saena_tpu.parallel.multihost import scaling_efficiency
from saena_tpu.parallel.sharded import (
    blocked_pad_vector, make_mesh, shard_hierarchy, sharded_solve_pCG)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=16,
                    help="cube edge per device (m^3 rows/device)")
    ap.add_argument("--devices", default=None,
                    help="comma list of device counts (default 1..all)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    n_all = len(jax.devices())
    counts = ([int(c) for c in args.devices.split(",")] if args.devices
              else sorted({1, 2, n_all} & set(range(1, n_all + 1))) or [1])
    m = args.per_device
    base_rate = None

    for D in counts:
        # weak scaling: constant m*m*m rows per device, stretched along z
        mz = m * D
        A0 = laplacian3D(m + 2, m + 2, mz + 2)
        A, _, _, _, rhs = remove_boundary_nodes(
            A0, laplacian3D_set_rhs(m + 2, m + 2, mz + 2))
        opts = Options(compress_halo=True)
        hier, info = H.setup(A, opts, dtype=jnp.float32)
        params = H.SolveParams.from_options(opts)
        mesh = make_mesh(D)
        sh, splits = shard_hierarchy(info, opts, mesh, dtype=jnp.float32)

        @partial(jax.jit, static_argnames=("n", "mesh"))
        def mv_chain(shh, xb, n, mesh=mesh):
            def body(sh_loc, x_loc):
                def it(i, v):
                    w = sh_loc.sharded[0].A.matvec(v, exact=True)
                    return w / (1.0 + jnp.max(jnp.abs(w)))
                out = jax.lax.fori_loop(0, n, it, x_loc[0])
                return jax.lax.psum(jnp.sum(out), sh_loc.axis)

            import dataclasses as dc
            specs = jax.tree.map(lambda _: P("d"), shh)
            specs = dc.replace(
                specs, replicated=jax.tree.map(lambda _: P(), shh.replicated))
            return jax.shard_map(
                body, mesh=mesh, in_specs=(specs, P("d")),
                out_specs=P(), check_vma=False)(shh, xb)

        xb = jnp.asarray(
            blocked_pad_vector(np.random.default_rng(0).standard_normal(
                A.shape[0]).astype(np.float32), splits[0]))
        float(mv_chain(sh, xb, n=5)); float(mv_chain(sh, xb, n=55))
        t0 = time.time(); float(mv_chain(sh, xb, n=5)); t5 = time.time() - t0
        t0 = time.time(); float(mv_chain(sh, xb, n=55)); t55 = time.time() - t0
        per = max(1e-9, (t55 - t5) / 50)
        nnz = sh.sharded[0].A.nnz
        rate = nnz / per
        if base_rate is None:
            base_rate = rate
        eff = scaling_efficiency(rate, base_rate, D)
        u, iters, r0, rfin, _ = sharded_solve_pCG(
            sh, splits, rhs, mesh, params=params, tol=1e-8, max_iter=100)
        print(f"D={D:3d}  n={A.shape[0]:9d}  nnz={nnz:11d}  "
              f"spmv={per * 1e6:9.1f} us  {rate:.3e} nnz/s  "
              f"eff={eff:5.2f}  pcg_iters={iters}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
