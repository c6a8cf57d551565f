#!/usr/bin/env python
"""Record convergence goldens (iteration counts + residual histories) for
the BASELINE.md parity workloads into tests/goldens/convergence.json.

The reference prints exactly these numbers on every solve
(/root/reference/src/saena_object_solve.cpp:1940-1982, 2502); BASELINE's
north star is reproducing its iteration counts. These goldens are
SELF-recorded f64 CPU runs serving as exact drift gates: any
hierarchy-semantics change that shifts counts or histories fails
tests/test_goldens.py loudly (VERDICT r1 #4). The TRUE reference counts
live alongside in reference_convergence.json, recorded from the reference
binary itself (built serially with the tools/refbuild/ stubs — its CMake's
hard MPI+MKL+SuperLU requirements are satisfied by a one-rank MPI stub, a
Gustavson mkl_dcsrmultcsr, and a LAPACK-backed pdgssvx).

Run from the repo root: python tools/record_goldens.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens", "convergence.json")
REF = "/root/reference/data"


def _solve(A_csr, opts, rhs, p_levels=None, max_iter=300):
    from saena_tpu import AMG, Matrix

    A = Matrix()
    A.set_csr(A_csr)
    A.assemble()
    solver = AMG()
    if p_levels is not None:
        solver.set_matrix(A, opts, p_levels=p_levels)
    else:
        solver.set_matrix(A, opts)
    solver.set_rhs(rhs)
    u, res = solver.solve_pCG(max_iter=max_iter)
    it = int(res.iters)
    hist = [float(x) for x in np.asarray(res.history)[: it + 1]]
    return {
        "iters": it,
        "rel_res": float(res.rel_res),
        "history": hist,
        "levels": list(solver.info.sizes),
        "coarsen_kinds": list(solver.info.coarsen_kinds),
    }


def main():
    from saena_tpu import Options, generators
    from saena_tpu.io.readers import read_bin, read_mtx

    goldens = {}

    # config 1: serial 3-D Poisson (test_serial.py scale; 48 = the bench
    # workload, also timed side-by-side with the reference binary)
    for m in (16, 24, 32, 48):
        A = generators.laplacian3D(m, m, m)
        rhs = generators.laplacian3D_set_rhs(m, m, m)
        goldens[f"poisson3d_{m}"] = _solve(
            A, Options(remove_boundary=True), rhs)
        print(f"poisson3d_{m}: {goldens[f'poisson3d_{m}']['iters']} iters")

    # lean-hierarchy variant (double aggregation, Options docstring)
    A = generators.laplacian3D(32, 32, 32)
    rhs = generators.laplacian3D_set_rhs(32, 32, 32)
    goldens["poisson3d_32_double"] = _solve(
        A, Options(remove_boundary=True, aggregation="double"), rhs)
    print(f"poisson3d_32_double: {goldens['poisson3d_32_double']['iters']} iters")

    # config 2: banded (experiments/banded.cpp workload). The 1/(i+j+1)
    # band matrix is a KERNEL workload (SpMV/smoother throughput), far too
    # ill-conditioned for pCG to reach 1e-8 — golden the first 30
    # iterations' residual history as the drift gate instead.
    Ab = generators.band_matrix(3000, 16)
    goldens["banded_3000_16"] = _solve(
        Ab, Options(), Ab @ np.ones(3000), max_iter=30)
    print(f"banded_3000_16: {goldens['banded_3000_16']['iters']} iters")

    # config 3: Florida collection
    fl = f"{REF}/FloridaCollection"
    if os.path.isdir(fl):
        Af = read_mtx(f"{fl}/bcsstk16.mtx")
        goldens["bcsstk16"] = _solve(Af, Options(),
                                     Af @ np.ones(Af.shape[0]))
        print(f"bcsstk16: {goldens['bcsstk16']['iters']} iters")
        As = read_bin(f"{fl}/SiH4.bin")
        goldens["sih4_scaled"] = _solve(As, Options(scale=True),
                                        As @ np.ones(As.shape[0]))
        print(f"sih4_scaled: {goldens['sih4_scaled']['iters']} iters")
        # unscaled twin: the configuration the REFERENCE binary can run
        # (its scale=true path dereferences the never-populated
        # inv_sq_diag_orig — see tools/refbuild/record_goldens.cpp), so
        # this is the SiH4 config with a true reference comparison point
        goldens["sih4"] = _solve(As, Options(), As @ np.ones(As.shape[0]))
        print(f"sih4: {goldens['sih4']['iters']} iters")

    # config 4: Helmholtz2D p-coarsening (P2-P5)
    hh = f"{REF}/Helmholtz2D_CG_curved_tri"
    if os.path.isdir(hh):
        from saena_tpu.amg.pcoarsen import (detect_modal_blocks,
                                            modal_block_plevels)
        for p in (2, 3, 4, 5):
            stem = f"{hh}/Helmholtz2D_CG_P{p}_Modes_curved_tri"
            Ah = read_bin(stem + ".bin")
            n_units = detect_modal_blocks(Ah, p)
            plv = modal_block_plevels(n_units, p)
            goldens[f"helmholtz_p{p}"] = _solve(
                Ah, Options(least_row_threshold=20),
                Ah @ np.ones(Ah.shape[0]), p_levels=plv)
            print(f"helmholtz_p{p}: {goldens[f'helmholtz_p{p}']['iters']} iters")

    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(goldens, f, indent=1)
    print(f"wrote {GOLDEN_PATH} ({len(goldens)} configs)")


if __name__ == "__main__":
    main()
