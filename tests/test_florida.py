"""Florida/SuiteSparse parity workload (BASELINE.md config 3; fixtures the
reference bundles in data/FloridaCollection — SURVEY.md §4.6): AMG setup
robustness + solve behavior on irregular sparsity, through the public API."""
import os

import numpy as np
import pytest

from saena_tpu import AMG, Matrix, Options

REF = "/root/reference/data/FloridaCollection"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference data absent")


def _solve(path, opts, max_iter=300):
    A = Matrix()
    A.read_file(path)
    A.assemble()
    solver = AMG()
    solver.set_matrix(A, opts)
    rhs = A.csr @ np.ones(A.get_num_rows())
    solver.set_rhs(rhs)
    u, res = solver.solve_pCG(max_iter=max_iter)
    return A, u, res


def test_bcsstk16_pcg():
    """SPD structural matrix: pCG+AMG converges in ~28 iterations."""
    A, u, res = _solve(f"{REF}/bcsstk16.mtx", Options())
    assert float(res.rel_res) < 1e-8
    assert int(res.iters) <= 40
    assert np.abs(u - 1.0).max() < 1e-5


def test_sih4_pcg_scaled():
    """SiH4 needs the symmetric D^{-1/2}AD^{-1/2} scaling (ref scale flag)."""
    A, u, res = _solve(f"{REF}/SiH4.bin", Options(scale=True))
    assert float(res.rel_res) < 1e-8
    assert np.abs(u - 1.0).max() < 1e-4


def test_fxm3_6_setup_robust():
    """Indefinite-ish fxm3_6: setup must not blow up and the solve must
    stay finite (the reference's own fixture never reaches 1e-8 either)."""
    A, u, res = _solve(f"{REF}/fxm3_6.bin", Options(scale=True), max_iter=50)
    assert np.isfinite(u).all()
    assert np.isfinite(float(res.final_res))
    # residual must at least decrease
    assert float(res.final_res) < float(res.init_res)


def test_bcsstk16_double_aggregation():
    """Lean-aggregation robustness on irregular sparsity (opt-in mode)."""
    A, u, res = _solve(f"{REF}/bcsstk16.mtx", Options(aggregation="double"))
    assert float(res.rel_res) < 1e-8
    assert int(res.iters) <= 60
    assert np.abs(u - 1.0).max() < 1e-5
