"""Benchmark driver. Prints ONE summary JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): SpMV nnz/s per chip on the 3-D Poisson
workload, plus V-cycle wall time and pCG iterations to 1e-8 as secondary
fields. The reference publishes no numbers ("published": {}), so vs_baseline
is reported against a fixed HBM-roofline model for this chip: ideal SpMV
streams ~12 bytes/nnz (f32 val + i32 col + amortized x/y traffic), so
  roofline_nnz_s = HBM_BW / 12.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _setup_poisson(m, dtype, opts=None):
    import jax.numpy as jnp
    from saena_tpu.config import Options
    from saena_tpu.amg import hierarchy as H
    from saena_tpu.core.coo import remove_boundary_nodes
    from saena_tpu.generators import laplacian3D, laplacian3D_set_rhs

    A0 = laplacian3D(m, m, m)
    rhs0 = laplacian3D_set_rhs(m, m, m)
    A, _, _, _, rhs = remove_boundary_nodes(A0, rhs0)
    opts = opts or Options()
    t0 = time.perf_counter()
    hier, info = H.setup(A, opts, dtype=dtype)
    setup_s = time.perf_counter() - t0
    return A, rhs, hier, info, opts, setup_s


def bench_spmv(A_dev, x, n_warm=5, n_iter=50):
    import jax

    f = jax.jit(lambda v: A_dev.matvec(v))
    for _ in range(n_warm):
        f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        y = f(x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from saena_tpu.amg.cycles import vcycle
    from saena_tpu.amg.hierarchy import SolveParams
    from saena_tpu.amg import solvers as S
    from saena_tpu.ops.formats import pad_to

    dtype = jnp.float32
    m = 64  # 64^3 = 262k rows, ~1.7M nnz fine level
    A, rhs, hier, info, opts, setup_s = _setup_poisson(m, dtype)
    params = SolveParams.from_options(opts)
    n = A.shape[0]

    # ---- SpMV nnz/s (hot kernel, fine level) ----
    A0 = hier.levels[0].A
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.pad(rng.standard_normal(n), (0, hier.n_pad - n)), dtype=dtype)
    spmv_s = bench_spmv(A0, x)
    nnz_per_s = A0.nnz / spmv_s

    # ---- V-cycle wall time ----
    vc = jax.jit(lambda r: vcycle(hier, params, jnp.zeros_like(r), r))
    for _ in range(3):
        vc(x).block_until_ready()
    t0 = time.perf_counter()
    N_VC = 20
    for _ in range(N_VC):
        y = vc(x)
    y.block_until_ready()
    vcycle_s = (time.perf_counter() - t0) / N_VC

    # ---- pCG iterations to 1e-8 (avg of 10 solves after 5 warmups,
    #      mirroring experiments/Poisson.cpp:216-246) ----
    rhs_pad = jnp.asarray(np.pad(rhs, (0, hier.n_pad - n)), dtype=dtype)
    res = S.solve_pCG(hier, rhs_pad, params=params, tol=1e-8, max_iter=100)
    iters = int(res.iters)
    rel = float(res.rel_res)
    for _ in range(4):
        S.solve_pCG(hier, rhs_pad, params=params, tol=1e-8,
                    max_iter=100).u.block_until_ready()
    t0 = time.perf_counter()
    N_SOLVE = 10
    for _ in range(N_SOLVE):
        out = S.solve_pCG(hier, rhs_pad, params=params, tol=1e-8, max_iter=100)
    out.u.block_until_ready()
    solve_s = (time.perf_counter() - t0) / N_SOLVE

    # roofline baseline: v5e ~ 819 GB/s HBM, ~12 B/nnz effective traffic
    hbm_bw = 819e9
    roofline = hbm_bw / 12.0
    vs_baseline = nnz_per_s / roofline

    line = {
        "metric": "spmv_nnz_per_s",
        "value": round(nnz_per_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(vs_baseline, 4),
        "detail": {
            "problem": f"poisson3d_{m}cube_interior",
            "n": n,
            "nnz": A0.nnz,
            "format": type(A0).__name__,
            "dtype": str(dtype.__name__ if hasattr(dtype, '__name__') else dtype),
            "spmv_us": round(spmv_s * 1e6, 2),
            "vcycle_ms": round(vcycle_s * 1e3, 3),
            "pcg_iters_to_1e8": iters,
            "pcg_rel_res": rel,
            "pcg_solve_ms": round(solve_s * 1e3, 2),
            "setup_s": round(setup_s, 2),
            "levels": info.sizes,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
