"""Benchmark driver. Prints ONE summary JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): SpMV nnz/s per chip on the 3-D Poisson
workload; V-cycle wall time and pCG iterations/solve-time to 1e-8 ride along
in "detail". The reference publishes no numbers ("published": {}), so
vs_baseline is reported against an HBM-roofline model: ideal f32 SpMV
streams ~12 bytes/nnz, so roofline = HBM_BW / 12 (v5e: 819 GB/s).
vs_baseline > 1 is possible for stencil operators: the DIA Pallas kernel
(ops/pallas_dia_spmv.py) stores ~4.6 bytes/nnz, keeps x in VMEM, and
rotates misaligned diagonals with a single lane roll, so it beats the
12-byte generic-sparse stream model (measured ~250-270 Gnnz/s = ~3.6-4x;
~330 Gnnz/s on the 64-diagonal 830k-row level).

Timing method: kernels are chained inside one jitted fori_loop returning a
SCALAR, and the per-iteration cost is the (t_long - t_short) slope of the
VALUE-FETCH time. Two platform gotchas drive this design (measured on the
axon-tunneled v5e): (a) block_until_ready does NOT synchronize — only
fetching a value does, and each fetch carries ~26 ms of RPC overhead that
the slope subtracts out; (b) the first execution after compile pays a
one-time upload, so each (fn, n) variant is warmed before timing. All
jitted functions take the matrix pytrees as ARGUMENTS (closing over device
arrays embeds them as constants and multiplies compile time).
"""
from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

N_SHORT = 5


def _slope_reps(f, *args, est_iter_s: float = 5e-4):
    """Per-iteration seconds via value-fetch times of two loop lengths;
    returns (median_s, all_rep_seconds) so callers can report the spread
    (VERDICT r4: round-over-round comparisons without a spread are partly
    fiction — ±7% rep scatter dwarfs real kernel changes).

    The long chain is sized from ``est_iter_s`` (a cheap per-iteration
    estimate, e.g. the HBM-roofline time) so the long-minus-short delta is
    ~60 ms of REAL device work — far above the tunnel's ms-scale RPC jitter.
    A fixed 100-iteration delta underflows for fast kernels (a 3 us SpMV x
    100 = 0.3 ms << jitter) and reports nonsense."""
    n_long = N_SHORT + int(np.clip(0.06 / max(est_iter_s, 1e-9), 100, 50_000))
    float(f(*args, n=N_SHORT))   # compile + first-exec upload
    float(f(*args, n=n_long))

    def _rep():
        t0 = time.perf_counter()
        float(f(*args, n=N_SHORT))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(*args, n=n_long))
        t_l = time.perf_counter() - t0
        return (t_l - t_s) / (n_long - N_SHORT)

    reps = [_rep() for _ in range(5)]
    # tunnel-jitter guard: when the 5-rep spread exceeds 15% of the
    # median the draw is untrustworthy (RPC latency spikes through the
    # tunnel swing 10x run to run) — take 5 more and use all 10; the
    # spread is reported either way so no draw masquerades as clean
    if _spread_pct(reps) > 15.0:
        reps += [_rep() for _ in range(5)]
    return max(1e-9, float(np.median(reps))), reps


def _slope(f, *args, est_iter_s: float = 5e-4):
    return _slope_reps(f, *args, est_iter_s=est_iter_s)[0]


def _spread_pct(reps) -> float:
    med = float(np.median(reps))
    return round((max(reps) - min(reps)) / max(med, 1e-12) * 100.0, 1)


def main():
    import jax
    import jax.numpy as jnp

    from saena_tpu.config import Options
    from saena_tpu.amg import hierarchy as H
    from saena_tpu.amg import solvers as S
    from saena_tpu.core.coo import remove_boundary_nodes
    from saena_tpu.generators import laplacian3D, laplacian3D_set_rhs

    dtype = jnp.float32
    # 48^3 = ~97k interior rows; SAENA_BENCH_M overrides (smaller = fewer/
    # faster remote compiles when the tunnel is slow)
    import os
    m = int(os.environ.get("SAENA_BENCH_M", "48"))
    A0 = laplacian3D(m, m, m)
    rhs0 = laplacian3D_set_rhs(m, m, m)
    A, _, _, _, rhs = remove_boundary_nodes(A0, rhs0)
    n = A.shape[0]

    # backend warmup OUTSIDE the setup timer: the first device op pays the
    # axon/XLA client handshake (~2-3 s) — library/backend init, not
    # per-matrix setup (the reference's Setup timer equally excludes
    # MPI_Init and binary load, experiments/Poisson.cpp:187-200)
    float(jnp.sum(jnp.zeros(8, dtype=dtype)))

    # default config runs the SHARD-PARALLEL setup (Options default
    # setup_shards=-1 routes here through the API too) and reports its
    # metered wire volume
    from saena_tpu.parallel.dist_setup import dist_setup

    opts = Options()
    t0 = time.perf_counter()
    hier, info = dist_setup(A, opts, dtype=dtype)
    setup_s = time.perf_counter() - t0
    params = H.SolveParams.from_options(opts)

    # ---- SpMV nnz/s (hot kernel, fine level), dispatch-free slope ----
    # chained iterations stay bounded by scaling the OPERATOR once by
    # 1/||A||_inf (scaling every float leaf of the format pytree scales the
    # stored values); the chain is then pure matvecs — no extra elementwise
    # pass distorting the per-matvec time
    inv_norm = float(1.0 / np.abs(A).sum(axis=1).max())

    @partial(jax.jit, static_argnames=("n",))
    def mv_chain(Amat, x, n):
        def body(i, v):
            return Amat.matvec(v)
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    A0dev = jax.tree.map(
        lambda leaf: leaf * inv_norm
        if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf,
        hier.levels[0].A)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.pad(rng.standard_normal(n), (0, hier.n_pad - n)),
                    dtype=dtype)
    # chain-sizing estimate: the DIA kernel runs ~3.6x ABOVE the 12 B/nnz
    # roofline (r5 roll kernel), so the raw roofline estimate sizes the
    # long chain 4x too short and the delta drops under the tunnel jitter
    # (measured 80% rep spread); divide accordingly
    est = A0dev.nnz * 12.0 / 819e9 / 4
    spmv_s, spmv_reps = _slope_reps(mv_chain, A0dev, x, est_iter_s=est)
    nnz_per_s = A0dev.nnz / spmv_s

    # bf16-stored twin of the same operator — the smoother matvec kernel
    # (smooth_dtype): bf16 diagonals streamed, f32 x/accumulator/output
    import dataclasses as _dc
    A0bf = _dc.replace(
        A0dev, data=(jnp.asarray(np.asarray(A0dev.data, dtype=np.float32))
                     .astype(jnp.bfloat16)))
    spmv_bf16_s, spmv_bf16_reps = _slope_reps(mv_chain, A0bf, x,
                                              est_iter_s=est / 2)
    nnz_per_s_bf16 = A0dev.nnz / spmv_bf16_s

    # ---- tunnel RPC floor: a value fetch costs ~26 ms through the axon
    # tunnel regardless of device work; measure it so solve times can be
    # reported both raw (wall) and device-side (wall - one fetch)
    zero = jax.jit(lambda v: jnp.sum(v) * 0.0)
    float(zero(x))
    rpc = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(zero(x))
        rpc.append(time.perf_counter() - t0)
    rpc_s = float(np.median(rpc))

    # ---- pCG to 1e-8: iterations + DEVICE solve time via a chained-solve
    # slope (a single wall measurement carries the tunnel's +-3 ms RPC
    # jitter — larger than the solve itself on the lean hierarchy)
    from saena_tpu.amg.solvers import _pcg

    @partial(jax.jit, static_argnames=("params", "max_iter", "n"))
    def solve_chain(hier_, rhs_, tol_, params, max_iter, n):
        def body(i, s):
            r_ = _pcg(hier_, params, rhs_ * (1.0 + 1e-30 * s), tol_,
                      max_iter)
            return s + r_.final_res * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), rhs_.dtype))

    def solve_slope(hier_, rhs_, params):
        tol_ = jnp.asarray(1e-8, rhs_.dtype)
        float(solve_chain(hier_, rhs_, tol_, params, 100, 2))
        float(solve_chain(hier_, rhs_, tol_, params, 100, 12))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(solve_chain(hier_, rhs_, tol_, params, 100, 2))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(solve_chain(hier_, rhs_, tol_, params, 100, 12))
            tl = time.perf_counter() - t0
            reps.append((tl - ts) / 10)
        return max(1e-9, float(np.median(reps)))

    rhs_pad = jnp.asarray(np.pad(rhs, (0, hier.n_pad - n)), dtype=dtype)
    res = S.solve_pCG(hier, rhs_pad, params=params, tol=1e-8, max_iter=100)
    iters = int(res.iters)
    rel = float(res.rel_res)
    solve_dev_s = solve_slope(hier, rhs_pad, params)
    t0 = time.perf_counter()
    out = S.solve_pCG(hier, rhs_pad, params=params, tol=1e-8, max_iter=100)
    float(out.final_res)
    solve_s = time.perf_counter() - t0          # wall incl. one RPC fetch
    RPC_S = rpc_s
    vcycle_s = solve_dev_s / max(1, iters)

    # ---- lean config: double aggregation (opt-in, Options docstring) ----
    # same problem/tolerance through the performance-oriented hierarchy
    lean = {}
    try:
        # lean: double aggregation + bf16-stored smoother operators (same
        # iteration count, ~18% faster device solve; smoothers stay
        # f32-accumulating — only streamed values shrink) + the reference's
        # INTERNAL 2+2 smoothing default (saena_object.h:162-163; 12 vs 10
        # iters but 9% less end-to-end device time)
        opts_l = Options(aggregation="double", smooth_dtype="bfloat16",
                         preSmooth=2, postSmooth=2)
        t0 = time.perf_counter()
        hier_l, info_l = H.setup(A, opts_l, dtype=dtype)
        lean_setup_s = time.perf_counter() - t0
        params_l = H.SolveParams.from_options(opts_l)
        rhs_l = jnp.asarray(np.pad(rhs, (0, hier_l.n_pad - n)), dtype=dtype)
        res_l = S.solve_pCG(hier_l, rhs_l, params=params_l, tol=1e-8,
                            max_iter=100)
        it_l = int(res_l.iters)
        solve_l_dev = solve_slope(hier_l, rhs_l, params_l)
        t0 = time.perf_counter()
        out = S.solve_pCG(hier_l, rhs_l, params=params_l, tol=1e-8,
                          max_iter=100)
        float(out.final_res)
        solve_l = time.perf_counter() - t0
        lean = {
            "pcg_iters_to_1e8": it_l,
            "pcg_rel_res": float(res_l.rel_res),
            "pcg_solve_ms": round(solve_l * 1e3, 2),
            "pcg_solve_ms_device": round(solve_l_dev * 1e3, 2),
            "vcycle_ms_est": round(solve_l_dev / max(1, it_l) * 1e3, 3),
            "setup_s": round(lean_setup_s, 2),
            "levels": info_l.sizes,
        }
    except Exception as e:           # lean mode must never break the bench
        lean = {"error": repr(e)}

    # ---- scale: the weak-scaled-workload answer (config 5 class) on ONE
    # chip — ~831k rows (96^3 interior) through the lean hierarchy; panelled
    # DIA + row-panelled strip8 keep multi-million-row levels on the Pallas
    # paths. SAENA_BENCH_SCALE_M overrides the edge (0 disables).
    scale = {}
    try:
        ms = int(os.environ.get("SAENA_BENCH_SCALE_M", "96"))
        if ms:
            As0 = laplacian3D(ms, ms, ms)
            rs0 = laplacian3D_set_rhs(ms, ms, ms)
            As, _, _, _, rs = remove_boundary_nodes(As0, rs0)
            ns = As.shape[0]
            opts_s = Options(aggregation="double", smooth_dtype="bfloat16",
                             preSmooth=2, postSmooth=2)
            t0 = time.perf_counter()
            hier_s, info_s = H.setup(As, opts_s, dtype=dtype)
            scale_setup_s = time.perf_counter() - t0
            params_s = H.SolveParams.from_options(opts_s)
            rhs_s = jnp.asarray(np.pad(rs, (0, hier_s.n_pad - ns)),
                                dtype=dtype)
            res_s = S.solve_pCG(hier_s, rhs_s, params=params_s, tol=1e-8,
                                max_iter=200)
            it_s = int(res_s.iters)
            t0 = time.perf_counter()
            out = S.solve_pCG(hier_s, rhs_s, params=params_s, tol=1e-8,
                              max_iter=200)
            float(out.final_res)
            solve_s_wall = time.perf_counter() - t0
            # fine-level SpMV rate at scale — operator scaled by 1/||A||_inf
            # exactly like the headline metric so the chained iterates stay
            # bounded (ADVICE r3: unscaled chains overflow to inf)
            inv_ns = float(1.0 / np.abs(As).sum(axis=1).max())
            A0s = jax.tree.map(
                lambda leaf: leaf * inv_ns
                if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf,
                hier_s.levels[0].A)
            xs_ = jnp.asarray(
                np.pad(np.random.default_rng(0).standard_normal(ns),
                       (0, hier_s.n_pad - ns)), dtype=dtype)
            est_s = A0s.nnz * 12.0 / 819e9 / 4
            sp_s = _slope(mv_chain, A0s, xs_, est_iter_s=est_s)
            scale = {
                "n": ns, "nnz": int(As.nnz),
                "setup_s": round(scale_setup_s, 2),
                "setup_phases": {k: round(v, 2)
                                 for k, v in sorted(
                                     getattr(info_s, "phases", {}).items(),
                                     key=lambda kv: -kv[1])
                                 if k != "upload_mb" and v >= 0.1},
                "pcg_iters_to_1e8": it_s,
                "pcg_rel_res": float(res_s.rel_res),
                "pcg_solve_ms": round(solve_s_wall * 1e3, 2),
                "spmv_us": round(sp_s * 1e6, 2),
                "spmv_nnz_per_s": round(A0s.nnz / sp_s, 1),
                "levels": info_s.sizes,
            }
    except Exception as e:            # scale mode must never break the bench
        scale = {"error": repr(e)}

    # ---- suite: the remaining runnable BASELINE workloads (VERDICT r4 #2)
    # — device matmat (config 3), banded kernels (config 2), Helmholtz P5
    # p-coarsening (config 4); Poisson (configs 1/5) is the headline above.
    suite = {}
    REF_DATA = "/root/reference/data"

    # (a) standalone SpGEMM on a Florida matrix through the device ring —
    # the reference's first-class matmat benchmark (experiments/gemm.cpp;
    # 20-iteration timed loop after warmups, setup_matmat.cpp:1178-1180).
    # G55 is its designated SpGEMM fixture (zero diagonal — not solvable).
    try:
        from saena_tpu.io.readers import read_bin
        from saena_tpu.ops.spgemm import matmat, matmat_prepare, matmat_run
        from saena_tpu.parallel.sharded import make_mesh

        G = read_bin(f"{REF_DATA}/FloridaCollection/G55.bin").tocsr()
        mesh1 = make_mesh(1)
        C_host = matmat(G, G, mesh1, dtype=jnp.float32)   # correctness pass
        Ab, Bb, _ = matmat_prepare(G, G, mesh1, dtype=jnp.float32)

        @partial(jax.jit, static_argnames=("n",))
        def mm_chain(Ab, Bb, n):
            def body(i, s):
                C = matmat_run(Ab, Bb * (1.0 + 1e-30 * s), mesh1)
                return s + C[0, 0, 0] * 1e-30
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        def mm_slope(n_long=20):
            float(mm_chain(Ab, Bb, 3))
            float(mm_chain(Ab, Bb, n_long))
            reps = []
            for _ in range(3):
                t0 = time.perf_counter(); float(mm_chain(Ab, Bb, 3))
                ts = time.perf_counter() - t0
                t0 = time.perf_counter(); float(mm_chain(Ab, Bb, n_long))
                tl = time.perf_counter() - t0
                reps.append((tl - ts) / (n_long - 3))
            return max(1e-9, float(np.median(reps)))

        mm_s = mm_slope()
        flops = 2.0 * G.nnz * (G.nnz / G.shape[0])   # sparse-effective
        suite["matmat_g55"] = {
            "n": G.shape[0], "nnz_a": int(G.nnz), "nnz_c": int(C_host.nnz),
            "matmat_ms": round(mm_s * 1e3, 3),
            "gflops_sparse_eff": round(flops / mm_s / 1e9, 2),
            # the ring runs the dense MXU strategy at G55's density — the
            # rate the MXU actually sustains on the shipped blocks
            "tflops_dense_path": round(
                2.0 * float(G.shape[0]) ** 3 / mm_s / 1e12, 2),
        }
    except Exception as e:
        suite["matmat_g55"] = {"error": repr(e)}

    # (b) banded kernels (ref experiments/banded.cpp — SpMV + smoother on
    # a band matrix, single chip): the DIA Pallas paths
    try:
        from saena_tpu.generators import band_matrix
        from saena_tpu.ops.formats import device_matrix_from_csr, pad_to

        Mb, bw = 100_000, 16
        Ab_csr = band_matrix(Mb, bw).tocsr()
        inv_nb = float(1.0 / np.abs(Ab_csr).sum(axis=1).max())
        Ab_dev = device_matrix_from_csr(Ab_csr.multiply(inv_nb).tocsr(),
                                        dtype=dtype)
        nb_pad = pad_to(Mb)
        xb = jnp.asarray(np.pad(
            np.random.default_rng(1).standard_normal(Mb),
            (0, nb_pad - Mb)), dtype=dtype)
        est_b = Ab_csr.nnz * 12.0 / 819e9
        sp_b, _ = _slope_reps(mv_chain, Ab_dev, xb, est_iter_s=est_b)

        from saena_tpu.amg.smoothers import jacobi
        # inverse diagonal of the SCALED operator; zero padding preserved
        dinv_h = np.zeros(nb_pad)
        dinv_h[:Mb] = 1.0 / (Ab_csr.diagonal() * inv_nb)
        dinv = jnp.asarray(dinv_h, dtype=dtype)

        @partial(jax.jit, static_argnames=("n",))
        def sm_chain(Amat, dinv, x, n):
            def body(i, v):
                return jacobi(Amat, dinv, v, jnp.zeros_like(v), 1)
            return jnp.sum(jax.lax.fori_loop(0, n, body, x))

        sm_b, _ = _slope_reps(sm_chain, Ab_dev, dinv, xb,
                              est_iter_s=2 * est_b)
        suite["banded_100k_16"] = {
            "n": Mb, "bandwidth": bw, "nnz": int(Ab_csr.nnz),
            "format": type(Ab_dev).__name__,
            "spmv_us": round(sp_b * 1e6, 2),
            "spmv_nnz_per_s": round(Ab_csr.nnz / sp_b, 1),
            "jacobi_us": round(sm_b * 1e6, 2),
            "jacobi_nnz_per_s": round(Ab_csr.nnz / sm_b, 1),
        }
    except Exception as e:
        suite["banded_100k_16"] = {"error": repr(e)}

    # (c) Helmholtz P5 p-coarsening (ref saena_object_pcoarsen_modal.cpp):
    # modal P-level chain + h-tail, pCG to 1e-8
    try:
        from saena_tpu.io.readers import read_bin
        from saena_tpu.amg.pcoarsen import (detect_modal_blocks,
                                            modal_block_plevels)

        Hm = read_bin(f"{REF_DATA}/Helmholtz2D_CG_curved_tri/"
                      "Helmholtz2D_CG_P5_Modes_curved_tri.bin").tocsr()
        n_units = detect_modal_blocks(Hm, 5)
        opts_h = Options(least_row_threshold=20)
        t0 = time.perf_counter()
        hier_h, info_h = H.setup(Hm, opts_h, dtype=dtype,
                                 p_levels=modal_block_plevels(n_units, 5))
        h_setup = time.perf_counter() - t0
        rhs_h = Hm @ np.ones(Hm.shape[0])
        rhs_hp = jnp.asarray(np.pad(rhs_h, (0, hier_h.n_pad - Hm.shape[0])),
                             dtype=dtype)
        params_h = H.SolveParams.from_options(opts_h)
        res_h = S.solve_pCG(hier_h, rhs_hp, params=params_h, tol=1e-8,
                            max_iter=100)
        t0 = time.perf_counter()
        out_h = S.solve_pCG(hier_h, rhs_hp, params=params_h, tol=1e-8,
                            max_iter=100)
        float(out_h.final_res)
        h_solve = time.perf_counter() - t0
        suite["helmholtz_p5"] = {
            "n": Hm.shape[0], "nnz": int(Hm.nnz),
            "setup_s": round(h_setup, 2),
            "pcg_iters_to_1e8": int(res_h.iters),
            "pcg_rel_res": float(res_h.rel_res),
            "pcg_solve_ms": round(h_solve * 1e3, 2),
            "levels": info_h.sizes,
            "coarsen_kinds": info_h.coarsen_kinds,
        }
    except Exception as e:
        suite["helmholtz_p5"] = {"error": repr(e)}

    # ---- per-iteration pCG phase split (ref solve_pCG_profile /
    # PROFILE_PCG accumulators, saena_object_solve.cpp:2804-3597)
    pcg_phases = {}
    try:
        from saena_tpu.profiling import pcg_profile

        pcg_phases = {k: round(v * 1e6, 2)
                      for k, v in pcg_profile(hier, params).items()}
    except Exception as e:
        pcg_phases = {"error": repr(e)}

    # ---- kernel-time model self-check: modeled (the constants format
    # selection ranks with) vs measured per-level matvec times
    mcheck = []
    try:
        from saena_tpu.profiling import model_check

        mcheck = model_check(hier)
        for row in mcheck:
            if row["ratio"] > 1.5 or row["ratio"] < 1 / 1.5:
                row["warn"] = "model drift >1.5x — re-measure the constant"
    except Exception as e:
        mcheck = [{"error": repr(e)}]

    hbm_bw = 819e9  # v5e
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
            "nnz": A0dev.nnz,
            "format": type(A0dev).__name__,
            "dtype": "float32",
            "spmv_us": round(spmv_s * 1e6, 2),
            "spmv_us_reps": [round(r * 1e6, 3) for r in spmv_reps],
            "spmv_spread_pct": _spread_pct(spmv_reps),
            "spmv_bf16_us": round(spmv_bf16_s * 1e6, 2),
            "spmv_bf16_us_reps": [round(r * 1e6, 3) for r in spmv_bf16_reps],
            "spmv_bf16_spread_pct": _spread_pct(spmv_bf16_reps),
            "spmv_bf16_nnz_per_s": round(nnz_per_s_bf16, 1),
            "vcycle_ms_est": round(vcycle_s * 1e3, 3),
            "pcg_iters_to_1e8": iters,
            "pcg_rel_res": rel,
            "pcg_solve_ms": round(solve_s * 1e3, 2),
            "pcg_solve_ms_device": round(solve_dev_s * 1e3, 2),
            "rpc_floor_ms": round(rpc_s * 1e3, 2),
            "setup_s": round(setup_s, 2),
            # wall minus tunnel-upload time: the number a production host
            # (PCIe, not a dev tunnel) would see — the tunnel's upload
            # bandwidth is bimodal (2 s vs 21 s observed for the same
            # 256 MB), so wall alone is a lottery draw
            "setup_host_s": round(
                setup_s - getattr(info, "phases", {}).get("upload", 0.0), 2),
            "setup_phases": {k: round(v, 2)
                             for k, v in sorted(
                                 getattr(info, "phases", {}).items(),
                                 key=lambda kv: -kv[1])
                             if k != "upload_mb"},
            "setup_upload_mb": round(
                getattr(info, "phases", {}).get("upload_mb", 0.0), 1),
            "setup_shards": getattr(info, "n_shards", 0),
            "setup_wire_mb": round(
                getattr(info.comm, "total_bytes", 0) / 1e6, 3)
            if getattr(info, "comm", None) is not None else None,
            "setup_wire_by_phase_mb": {
                k: [round(v / 1e6, 2),
                    round(info.comm.raw_by_phase.get(k, v) / 1e6, 2)]
                for k, v in sorted(info.comm.bytes_by_phase.items())}
            if getattr(info, "comm", None) is not None else None,
            "model_check": mcheck,
            "pcg_phases_us": pcg_phases,
            "levels": info.sizes,
            "lean": lean,
            "scale": scale,
            "suite": suite,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
