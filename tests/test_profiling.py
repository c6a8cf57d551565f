"""Profiling surfaces + scipy comparison oracles."""
import numpy as np

from saena_tpu.config import Options
from saena_tpu.amg import hierarchy as H
from saena_tpu.generators import laplacian2D, laplacian3D, random_symm_matrix
from saena_tpu.profiling import format_breakdown, profile_matvecs, vcycle_breakdown
from saena_tpu import oracles


def test_profile_matvecs():
    A = laplacian3D(8, 8, 8)
    hier, info = H.setup(A, Options())
    rows = profile_matvecs(hier, n_iter=3)
    assert len(rows) == hier.n_levels
    assert all(r["nnz_per_s"] > 0 for r in rows)
    assert rows[0]["n"] == A.shape[0]


def test_vcycle_breakdown():
    A = laplacian2D(24, 24)
    opts = Options()
    hier, _ = H.setup(A, opts)
    params = H.SolveParams.from_options(opts)
    rhs = np.zeros(hier.n_pad)
    rhs[: A.shape[0]] = 1.0
    bd = vcycle_breakdown(hier, params, rhs, n_iter=3)
    for key in ("smooth", "resid", "Rtransfer+Ptransfer", "coarsest",
                "other", "total"):
        assert key in bd
    assert "total" in format_breakdown(bd)


def test_oracles():
    A = random_symm_matrix(80, 0.1, seed=3)
    rhs = A @ np.ones(80)
    u = oracles.solve_scipy_direct(A, rhs)
    np.testing.assert_allclose(u, 1.0, rtol=1e-8)
    u2, iters = oracles.solve_scipy_cg(A + 10 * np.eye(80), rhs)
    assert iters > 0
    B = random_symm_matrix(80, 0.1, seed=4)
    C = (A @ B).tocsr()
    assert oracles.check_matmat(A, B, C) < 1e-12
    assert oracles.matrix_diff(A, A) == 0.0


def test_scaling_efficiency_helper():
    from saena_tpu.parallel.multihost import scaling_efficiency

    assert scaling_efficiency(8e9, 1e9, 8) == 1.0
    assert scaling_efficiency(4e9, 1e9, 8) == 0.5


def test_profile_sharded_matvecs():
    """Per-phase (pack/comm/local/total) sharded matvec profile on the
    8-device mesh (ref part1..part6, saena_matrix_matvec.cpp:553-634)."""
    import jax
    from saena_tpu.core.coo import remove_boundary_nodes
    from saena_tpu.parallel.sharded import make_mesh, shard_hierarchy
    from saena_tpu.profiling import format_sharded_profile, profile_sharded_matvecs

    A0 = laplacian3D(16, 16, 16)
    A, *_ = remove_boundary_nodes(A0, np.zeros(16 ** 3))
    opts = Options(replicate_threshold=500)
    hier, info = H.setup(A, opts)
    mesh = make_mesh(8)
    sh, splits = shard_hierarchy(info, opts, mesh)
    rows = profile_sharded_matvecs(sh, mesh, n_iter=4)
    assert len(rows) == len(sh.sharded)
    for r in rows:
        assert r["total_us"] > 0 and r["nnz_per_s"] > 0
        if "comm_us" in r:
            assert r["local_us"] >= 0
    out = format_sharded_profile(rows)
    assert "total_us" in out and str(rows[0]["n"]) in out

def test_profile_sharded_matvecs_six_part_compressed():
    """VERDICT r4 #6: with halo compression active, profile rows carry the
    reference's SIX-part matvec split — pack / compress / comm / local /
    remote / decompress (saena_matrix_matvec.cpp:553-634)."""
    from saena_tpu.core.coo import remove_boundary_nodes
    from saena_tpu.parallel.sharded import make_mesh, shard_hierarchy
    from saena_tpu.profiling import (format_sharded_profile,
                                     profile_sharded_matvecs)

    A0 = laplacian3D(16, 16, 16)
    A, *_ = remove_boundary_nodes(A0, np.zeros(16 ** 3))
    opts = Options(replicate_threshold=500, compress_halo=True,
                   halo_dtype="int8_block")
    hier, info = H.setup(A, opts)
    mesh = make_mesh(8)
    sh, splits = shard_hierarchy(info, opts, mesh, sharded_format="ell")
    rows = profile_sharded_matvecs(sh, mesh, n_iter=4)
    assert len(rows) == len(sh.sharded)
    found_six = False
    for r in rows:
        if "compress_us" in r:
            found_six = True
            for k in ("pack_us", "compress_us", "comm_us", "local_us",
                      "remote_us", "decompress_us"):
                assert k in r and r[k] >= 0.0, k
            # the halo-attributed remote share exists on a sharded stencil
            assert r["remote_us"] >= 0.0
    assert found_six, "no compressed level produced the six-part split"
    out = format_sharded_profile(rows)
    assert "comp_us" in out and "dcmp_us" in out

def test_pcg_profile_phases():
    """AMG.solve_pCG_profile carries the per-iteration PROFILE_PCG split
    (ref saena_object_solve.cpp:2804-3597) alongside the V-cycle
    component breakdown."""
    from saena_tpu import AMG, Matrix, Options

    m = 12
    A = Matrix(); A.set_csr(laplacian3D(m, m, m)); A.assemble()
    s = AMG(); s.set_matrix(A, Options(remove_boundary=True))
    rhs = A.csr @ np.ones(A.csr.shape[0])
    s.set_rhs(rhs)
    u, res, bd = s.solve_pCG_profile()
    assert float(res.rel_res) < 1e-7
    ph = bd["pcg_phases"]
    for k in ("precond", "matvec", "dots", "iteration", "other"):
        assert k in ph and ph[k] >= 0.0, (k, ph)
    assert ph["iteration"] > 0 and ph["precond"] > 0
    assert "smooth" in bd and "total" in bd
