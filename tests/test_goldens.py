"""Convergence goldens: EXACT iteration counts + residual histories for the
BASELINE.md parity workloads (VERDICT r1 #4).

The reference prints these numbers on every solve (saena_object_solve.cpp:
1940-1982, 2502) and BASELINE's north star is reproducing its iteration
counts. The reference binary cannot be built in this image (its CMake hard-
requires MPI and MKL; neither is installed — see tools/record_goldens.py),
so the goldens are self-recorded f64 CPU runs that act as exact drift
gates: any hierarchy-semantics change (strength, aggregation, smoothing,
filtering, eig estimate, transfer operators) shifts a count or history and
fails here loudly. Regenerate deliberately with tools/record_goldens.py.
"""
import json
import os

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "convergence.json")
REF = "/root/reference/data"

with open(GOLDEN_PATH) as f:
    GOLDENS = json.load(f)


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
    return it, np.asarray(res.history)[: it + 1], list(solver.info.sizes)


def _check(key, it, hist, levels):
    g = GOLDENS[key]
    assert levels == g["levels"], \
        f"{key}: hierarchy sizes drifted {g['levels']} -> {levels}"
    assert it == g["iters"], \
        f"{key}: iteration count drifted {g['iters']} -> {it}"
    np.testing.assert_allclose(
        hist, np.asarray(g["history"]), rtol=1e-6,
        err_msg=f"{key}: residual history drifted")


@pytest.mark.parametrize("m", [16, 24, 32])
def test_golden_poisson3d(m):
    from saena_tpu import Options, generators

    A = generators.laplacian3D(m, m, m)
    rhs = generators.laplacian3D_set_rhs(m, m, m)
    it, hist, levels = _solve(A, Options(remove_boundary=True), rhs)
    _check(f"poisson3d_{m}", it, hist, levels)


def test_golden_poisson3d_double_aggregation():
    from saena_tpu import Options, generators

    A = generators.laplacian3D(32, 32, 32)
    rhs = generators.laplacian3D_set_rhs(32, 32, 32)
    it, hist, levels = _solve(
        A, Options(remove_boundary=True, aggregation="double"), rhs)
    _check("poisson3d_32_double", it, hist, levels)


def test_golden_banded():
    """Kernel workload: too ill-conditioned to reach 1e-8; the golden is
    the first 30 iterations' residual history (see record_goldens.py)."""
    from saena_tpu import Options, generators

    A = generators.band_matrix(3000, 16)
    it, hist, levels = _solve(A, Options(), A @ np.ones(3000), max_iter=30)
    _check("banded_3000_16", it, hist, levels)


@pytest.mark.skipif(not os.path.isdir(f"{REF}/FloridaCollection"),
                    reason="reference data absent")
def test_golden_bcsstk16():
    from saena_tpu import Options
    from saena_tpu.io.readers import read_mtx

    A = read_mtx(f"{REF}/FloridaCollection/bcsstk16.mtx")
    it, hist, levels = _solve(A, Options(), A @ np.ones(A.shape[0]))
    _check("bcsstk16", it, hist, levels)


@pytest.mark.skipif(not os.path.isdir(f"{REF}/FloridaCollection"),
                    reason="reference data absent")
def test_golden_sih4_scaled():
    from saena_tpu import Options
    from saena_tpu.io.readers import read_bin

    A = read_bin(f"{REF}/FloridaCollection/SiH4.bin")
    it, hist, levels = _solve(A, Options(scale=True),
                              A @ np.ones(A.shape[0]))
    _check("sih4_scaled", it, hist, levels)


@pytest.mark.parametrize("p", [2, 5])
@pytest.mark.skipif(not os.path.isdir(f"{REF}/Helmholtz2D_CG_curved_tri"),
                    reason="reference data absent")
def test_golden_helmholtz(p):
    from saena_tpu import Options
    from saena_tpu.io.readers import read_bin
    from saena_tpu.amg.pcoarsen import detect_modal_blocks, modal_block_plevels

    stem = (f"{REF}/Helmholtz2D_CG_curved_tri/"
            f"Helmholtz2D_CG_P{p}_Modes_curved_tri")
    A = read_bin(stem + ".bin")
    n_units = detect_modal_blocks(A, p)
    it, hist, levels = _solve(
        A, Options(least_row_threshold=20), A @ np.ones(A.shape[0]),
        p_levels=modal_block_plevels(n_units, p))
    _check(f"helmholtz_p{p}", it, hist, levels)
