"""AMG hierarchy + solver convergence tests.

Oracles per SURVEY.md §4: manufactured-solution Laplacian check, residual
tolerance check, Galerkin product vs scipy R@A@P, iteration counts in the
range AMG-preconditioned CG delivers on Poisson problems."""
import numpy as np
import pytest
import scipy.sparse as sp

from saena_tpu.config import Options
from saena_tpu.amg import hierarchy as H
from saena_tpu.amg import solvers as S
from saena_tpu.amg.strength import aggregate_mis1, find_aggregation, strength_graph
from saena_tpu.amg.prolongation import smoothed_prolongator, restriction
from saena_tpu.amg.galerkin import filter_lump, galerkin_product
from saena_tpu.generators import band_matrix, laplacian2D, laplacian3D, laplacian3D_set_rhs
from saena_tpu.ops.formats import pad_to


def _pad(v, n_pad):
    return np.pad(v, (0, n_pad - v.size))


def test_strength_and_aggregation():
    A = laplacian3D(10, 10, 10)
    S_ = strength_graph(A, 0.3)
    assert S_.nnz > 0
    agg, roots = aggregate_mis1(S_)
    n = A.shape[0]
    assert agg.shape == (n,)
    assert roots.size < n
    assert (agg >= 0).all() and (agg < roots.size).all()
    # every aggregate is used
    assert np.unique(agg).size == roots.size
    # roots map to their own aggregate id
    np.testing.assert_array_equal(agg[roots], np.arange(roots.size))


def test_aggregation_coarsening_ratio():
    A = laplacian2D(32, 32)
    agg, n_c, _ = find_aggregation(A, 0.3)
    ratio = A.shape[0] / n_c
    assert 1.5 < ratio < 10


def test_galerkin_vs_scipy():
    A = laplacian2D(20, 20)
    agg, n_c, _ = find_aggregation(A, 0.3)
    P = smoothed_prolongator(A, agg, n_c)
    R = restriction(P)
    Ac = galerkin_product(R, A, P)
    ref = (P.T @ A @ P).tocsr()
    assert np.abs(Ac - ref).max() < 1e-12


def test_filter_lump_preserves_rowsum():
    A = laplacian2D(16, 16)
    agg, n_c, _ = find_aggregation(A, 0.3)
    P = smoothed_prolongator(A, agg, n_c)
    Ac = galerkin_product(restriction(P), A, P)
    F = filter_lump(Ac, 1e-3)
    np.testing.assert_allclose(
        np.asarray(F.sum(axis=1)).ravel(), np.asarray(Ac.sum(axis=1)).ravel(),
        rtol=1e-12, atol=1e-12,
    )


def _solve_problem(A, rhs, opts=None, solver="pCG", **kw):
    opts = opts or Options()
    hier, info = H.setup(A, opts)
    params = H.SolveParams.from_options(opts)
    rhs_p = _pad(rhs, hier.n_pad)
    fn = {"pCG": S.solve_pCG, "CG": S.solve_CG, "vcycle": S.solve,
          "smoother": S.solve_smoother, "GMRES": S.solve_GMRES}[solver]
    res = fn(hier, rhs_p, params=params, **kw)
    return hier, info, res


def test_pcg_poisson3d():
    m = 16
    A = laplacian3D(m, m, m)
    rhs = laplacian3D_set_rhs(m, m, m)
    hier, info, res = _solve_problem(A, rhs, tol=1e-8, max_iter=100)
    assert hier.n_levels >= 2
    assert float(res.rel_res) < 1e-8
    # AMG-preconditioned CG on Poisson: expect O(10) iterations
    assert int(res.iters) < 40
    # residual check against scipy
    u = np.asarray(res.u)[: A.shape[0]]
    r = rhs - A @ u
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-7


def test_pcg_poisson2d():
    A = laplacian2D(40, 40)
    rhs = np.ones(A.shape[0])
    _, _, res = _solve_problem(A, rhs, tol=1e-8, max_iter=100)
    assert float(res.rel_res) < 1e-8
    assert int(res.iters) < 40


def test_pcg_band_shifted():
    # band_matrix itself is indefinite (the reference uses it only for
    # SpMV/smoother benchmarks); shift to SPD for the CG path
    A = (band_matrix(500, 4) + 0.5 * sp.identity(500)).tocsr()
    rhs = np.ones(500)
    _, _, res = _solve_problem(A, rhs, tol=1e-8, max_iter=200)
    u = np.asarray(res.u)[:500]
    assert np.linalg.norm(rhs - A @ u) / np.linalg.norm(rhs) < 1e-7


def test_gmres_band_indefinite():
    # indefinite system: CG inapplicable; full (unrestarted) GMRES must solve
    A = band_matrix(300, 4)
    rhs = np.ones(300)
    _, _, res = _solve_problem(A, rhs, solver="GMRES", tol=1e-8,
                               max_iter=300, restart=300, precondition=False)
    assert float(res.final_res / res.init_res) < 1e-6


def test_jacobi_smoother_option():
    A = laplacian2D(24, 24)
    rhs = np.ones(A.shape[0])
    opts = Options(smoother="jacobi", preSmooth=2, postSmooth=2)
    _, _, res = _solve_problem(A, rhs, opts=opts, tol=1e-8, max_iter=150)
    assert float(res.rel_res) < 1e-8


def test_vcycle_stationary_solver():
    m = 12
    A = laplacian3D(m, m, m)
    rhs = laplacian3D_set_rhs(m, m, m)
    _, _, res = _solve_problem(A, rhs, solver="vcycle", tol=1e-8, max_iter=60)
    assert float(res.rel_res) < 1e-8


def test_plain_cg():
    A = laplacian2D(16, 16)
    rhs = np.ones(A.shape[0])
    _, _, res = _solve_problem(A, rhs, solver="CG", tol=1e-8, max_iter=2000)
    assert float(res.rel_res) < 1e-8


def test_gmres():
    m = 10
    A = laplacian3D(m, m, m)
    rhs = laplacian3D_set_rhs(m, m, m)
    _, _, res = _solve_problem(A, rhs, solver="GMRES", tol=1e-8, max_iter=100)
    assert float(res.final_res / res.init_res) < 1e-7


def test_gmres_device_host_parity():
    """The jitted Arnoldi (engine='device', the default) must reproduce the
    host-driven loop's iteration count and residual level (VERDICT r3 #3:
    'parity-test vs the current host implementation')."""
    A = laplacian2D(30, 30) + 0.05 * sp.random(
        900, 900, density=0.002, random_state=0, format="csr")
    A = (A + A.T).tocsr() + 2.0 * sp.identity(900, format="csr")
    rhs = np.cos(np.arange(900) * 0.13)
    hier, _ = H.setup(A.tocsr(), Options())
    params = H.SolveParams.from_options(Options())
    rhs_p = _pad(rhs, hier.n_pad)
    out = {}
    for eng in ("host", "device"):
        r = S.solve_GMRES(hier, rhs_p, params=params, tol=1e-8,
                          max_iter=120, restart=25, engine=eng)
        out[eng] = (int(r.iters), float(r.final_res / r.init_res))
        u = np.asarray(r.u)[:900]
        assert np.linalg.norm(rhs - A @ u) / np.linalg.norm(rhs) < 1e-7, eng
    assert out["host"][0] == out["device"][0]
    # same convergence level (identical recurrence at the same precision)
    assert abs(np.log10(out["host"][1]) - np.log10(out["device"][1])) < 0.5


def test_gmres_device_restarted_indefinite():
    """Restart path of the jitted engine: GMRES(40) legitimately STAGNATES
    on this indefinite band operator (the full-Krylov test above converges);
    the device engine must reproduce the host engine's stagnation level and
    iteration count through many restart cycles — exercising the padded
    triangular solve and restart carry."""
    A = band_matrix(300, 4)
    rhs = np.ones(300)
    hier, _ = H.setup(A.tocsr(), Options())
    params = H.SolveParams.from_options(Options())
    rhs_p = _pad(rhs, hier.n_pad)
    out = {}
    for eng in ("host", "device"):
        r = S.solve_GMRES(hier, rhs_p, params=params, tol=1e-8,
                          max_iter=300, restart=40, precondition=False,
                          engine=eng)
        u = np.asarray(r.u)[:300]
        out[eng] = (int(r.iters),
                    np.linalg.norm(rhs - A @ u) / np.linalg.norm(rhs))
    assert out["host"][0] == out["device"][0]
    np.testing.assert_allclose(out["device"][1], out["host"][1], rtol=1e-2)


def test_manufactured_solution():
    """Solve -lap u = f and compare to the manufactured solution
    (ref laplacian3D_check_solution, aux_functions2.cpp:702)."""
    from saena_tpu.generators import laplacian3D_solution

    m = 24
    A = laplacian3D(m, m, m)
    rhs = laplacian3D_set_rhs(m, m, m)
    _, _, res = _solve_problem(A, rhs, tol=1e-10, max_iter=200)
    u = np.asarray(res.u)[: A.shape[0]]
    u_exact = laplacian3D_solution(m, m, m)
    # discretization error dominates: O(h^2) ~ (1/23)^2 ~ 2e-3
    err = np.abs(u - u_exact).max() / np.abs(u_exact).max()
    assert err < 0.05


def test_scale_option():
    m = 12
    A = laplacian3D(m, m, m)
    rhs = laplacian3D_set_rhs(m, m, m)
    opts = Options(scale=True)
    _, _, res = _solve_problem(A, rhs, opts=opts, tol=1e-8, max_iter=100)
    u = np.asarray(res.u)[: A.shape[0]]
    assert np.linalg.norm(rhs - A @ u) / np.linalg.norm(rhs) < 1e-6


def test_float_level_mixed_precision():
    """float_level's serial semantics now match the reference: the float
    path only narrows the HALO WIRE (matvec_sparse_float keeps val_local/v
    double, saena_matrix_matvec.cpp:448-520), so at one rank it is a no-op
    and operators stay at the vector dtype. Whole-operator reduction is the
    opt-in float_storage flag (it cost 53 -> 156 iterations on SiH4)."""
    m = 14
    A = laplacian3D(m, m, m)
    rhs = laplacian3D_set_rhs(m, m, m)
    hi, _, res64 = _solve_problem(A, rhs, opts=Options(float_level=99), tol=1e-8)
    lo, _, res32 = _solve_problem(
        A, rhs, opts=Options(float_level=1, float_storage=True), tol=1e-8)
    assert float(res32.rel_res) < 1e-8  # preconditioner quality survives f32
    assert str(lo.levels[-1].A.dtype) == "float32"
    assert str(hi.levels[-1].A.dtype) == "float64"
    # default (reference semantics): serial hierarchy keeps full precision
    df, _, _ = _solve_problem(A, rhs, opts=Options(), tol=1e-8)
    assert str(df.levels[-1].A.dtype) == "float64"


def test_solver_params_cache_hit():
    """Second solve with same shapes must not re-trace (cached jit)."""
    A = laplacian2D(20, 20)
    rhs = np.ones(A.shape[0])
    opts = Options()
    hier, _ = H.setup(A, opts)
    params = H.SolveParams.from_options(opts)
    rhs_p = _pad(rhs, hier.n_pad)
    r1 = S.solve_pCG(hier, rhs_p, params=params)
    r2 = S.solve_pCG(hier, 2 * rhs_p, params=params)
    np.testing.assert_allclose(np.asarray(r2.u), 2 * np.asarray(r1.u), rtol=1e-10)


def test_bfloat16_mid_levels():
    """bf16 levels >= float_level keep preconditioner quality (the TPU
    analog of the reference's float_level single-precision levels)."""
    m = 14
    A = laplacian3D(m, m, m)
    rhs = laplacian3D_set_rhs(m, m, m)
    opts = Options(float_level=1, low_dtype="bfloat16", float_storage=True)
    hier, info, = H.setup(A, opts)
    params = H.SolveParams.from_options(opts)
    res = S.solve_pCG(hier, _pad(rhs, hier.n_pad), params=params,
                      tol=1e-8, max_iter=60)
    assert float(res.rel_res) < 1e-8
    assert str(hier.levels[-1].A.dtype) == "bfloat16"
    # coarsest direct solver must have been promoted to at least f32
    fac = hier.coarse_lu.inv if hier.coarse_lu.inv is not None else hier.coarse_lu.lu
    assert fac.dtype in (np.dtype("float32"), np.dtype("float64"))


def test_residual_replacement_honesty():
    """With replacement every iteration, the internal residual equals the
    honestly evaluated one (true_res)."""
    import dataclasses as dc

    m = 12
    A = laplacian3D(m, m, m)
    rhs = laplacian3D_set_rhs(m, m, m)
    opts = Options()
    hier, _ = H.setup(A, opts)
    params = dc.replace(H.SolveParams.from_options(opts), residual_replace=1)
    res = S.solve_pCG(hier, _pad(rhs, hier.n_pad), params=params,
                      tol=1e-8, max_iter=60)
    assert float(res.rel_res) < 1e-8
    np.testing.assert_allclose(float(res.final_res), float(res.true_res),
                               rtol=1e-6)


def test_double_aggregation_lean_hierarchy():
    """Options(aggregation="double"): composed two-pass aggregation (the
    working form of the reference's disabled aggregation_2_dist) must give
    >= 3.5x first-level coarsening and far less coarse-grid nnz than dist1,
    converging within a few extra iterations."""
    from saena_tpu.config import Options
    from saena_tpu.amg import hierarchy as H
    from saena_tpu.amg import solvers as S
    from saena_tpu.core.coo import remove_boundary_nodes

    m = 20
    A0 = laplacian3D(m, m, m)
    A, *_ = remove_boundary_nodes(A0, np.ones(A0.shape[0]))
    n = A.shape[0]
    rhs = A @ np.ones(n)
    out = {}
    for mode in ("dist1", "double"):
        opts = Options(aggregation=mode)
        hier, info = H.setup(A, opts)
        params = H.SolveParams.from_options(opts)
        res = S.solve_pCG(hier, np.pad(rhs, (0, hier.n_pad - n)),
                          params=params, tol=1e-8, max_iter=100)
        u = np.asarray(res.u)[:n]
        rel = np.linalg.norm(rhs - A @ u) / np.linalg.norm(rhs)
        assert rel < 1e-7, (mode, rel)
        out[mode] = (int(res.iters), info.sizes, sum(info.nnzs[1:]))
    it1, sizes1, cn1 = out["dist1"]
    it2, sizes2, cn2 = out["double"]
    assert sizes2[1] * 3.5 <= sizes2[0]          # real coarsening ratio
    assert cn2 * 4 < cn1                          # much leaner coarse grids
    assert it2 <= it1 + 6                         # convergence preserved


def test_device_rap_matches_host():
    """Options(rap="device") routes the Galerkin product through the
    block-sparse MXU engine; at f64 (CPU tests) the hierarchy and
    iteration counts match the host torch-MKL product exactly."""
    from saena_tpu.generators import laplacian3D, laplacian3D_set_rhs
    from saena_tpu.core.coo import remove_boundary_nodes
    from saena_tpu.amg import solvers as S

    A0 = laplacian3D(14, 14, 14)
    A, *_ = remove_boundary_nodes(A0, np.zeros(14 ** 3))
    rhs0 = laplacian3D_set_rhs(14, 14, 14)
    _, _, _, _, rhs = remove_boundary_nodes(A0, rhs0)

    hier_h, info_h = H.setup(A, Options())
    hier_d, info_d = H.setup(A, Options(rap="device"))
    assert info_h.sizes == info_d.sizes
    for Ah, Ad in zip(info_h.csr_levels, info_d.csr_levels):
        assert abs(Ah - Ad).max() < 1e-11

    params = H.SolveParams.from_options(Options())
    rp = np.pad(rhs, (0, hier_h.n_pad - A.shape[0]))
    r1 = S.solve_pCG(hier_h, rp, params=params, tol=1e-8, max_iter=100)
    r2 = S.solve_pCG(hier_d, rp, params=params, tol=1e-8, max_iter=100)
    assert int(r1.iters) == int(r2.iters)


def test_smooth_dtype_reduced_operators():
    """Options(smooth_dtype=...) builds reduced smoother-operator copies;
    the outer Krylov still sees the exact operator and convergence holds
    within an iteration of the full-precision run."""
    from saena_tpu.generators import laplacian3D
    from saena_tpu.core.coo import remove_boundary_nodes
    from saena_tpu.amg import solvers as S

    A, *_ = remove_boundary_nodes(laplacian3D(16, 16, 16), np.zeros(16 ** 3))
    rhs = A @ np.ones(A.shape[0])
    base = H.setup(A, Options(aggregation="double"))[0]
    red, info = H.setup(A, Options(aggregation="double",
                                   smooth_dtype="float32"))
    # non-DIA, non-coarsest levels carry the reduced copy
    kinds = [(type(l.A).__name__, l.A_smooth is not None)
             for l in red.levels[:-1]]
    assert any(has for k, has in kinds if k != "DiaMatrix"), kinds
    assert all(l.A_smooth is None or l.A_smooth.dtype == np.float32
               for l in red.levels)
    params = H.SolveParams.from_options(Options())
    rp = np.pad(rhs, (0, base.n_pad - A.shape[0]))
    r0 = S.solve_pCG(base, rp, params=params, tol=1e-8, max_iter=100)
    r1 = S.solve_pCG(red, rp, params=params, tol=1e-8, max_iter=100)
    assert float(r1.rel_res) < 1e-8
    assert abs(int(r1.iters) - int(r0.iters)) <= 1


def test_mis1_native_matches_fixpoint():
    """The native single-pass MIS(1) sweep (_native/mis1.cpp) must produce
    the EXACT aggregation of the reference-parity min-index fixpoint — the
    fixpoint resolves to the lexicographically first MIS, whose closed form
    the native pass evaluates. Any divergence here would silently shift
    hierarchies and iteration counts (goldens would also trip)."""
    from saena_tpu.amg.strength import _aggregate_mis1_fixpoint
    from saena_tpu.core.coo import remove_boundary_nodes
    from saena_tpu.generators import random_symm_matrix
    from saena_tpu import _native

    if not _native.have_native():
        pytest.skip("no native toolchain")

    cases = []
    A, *_ = remove_boundary_nodes(laplacian3D(20, 20, 20), np.zeros(20 ** 3))
    cases.append(strength_graph(A.tocsr(), 0.3))
    cases.append(strength_graph(A.tocsr(), 0.7))
    cases.append(strength_graph(band_matrix(800, 25).tocsr(), 0.3))
    cases.append(strength_graph(random_symm_matrix(700, 0.02, seed=5), 0.3))
    for S_ in cases:
        agg_n, roots_n = aggregate_mis1(S_)
        agg_f, roots_f = _aggregate_mis1_fixpoint(S_)
        assert np.array_equal(agg_n, agg_f)
        assert np.array_equal(roots_n, roots_f)


def test_gmres_device_total_breakdown_no_nan():
    """ADVICE r4: when A z lies exactly in span(V) with nothing left
    (rotated Hcol[k] == h_next == 0) the Givens rotation hits 0/0; the
    device engine must mask it instead of poisoning H/g with NaN. A
    block-diagonal singular SPD-semidefinite operator with the rhs in its
    nullspace triggers the breakdown on the very first Arnoldi step:
    A r0 = 0."""
    n = 128
    A = sp.csr_matrix(sp.kron(sp.identity(n // 2),
                              np.array([[1.0, 1.0], [1.0, 1.0]])))
    rhs = np.tile([1.0, -1.0], n // 2)        # exact nullspace of A
    assert np.abs(A @ rhs).max() == 0.0
    hier, _ = H.setup(A, Options(remove_boundary=False))
    params = H.SolveParams.from_options(Options())
    r = S.solve_GMRES(hier, _pad(rhs, hier.n_pad), params=params,
                      tol=1e-8, max_iter=5, restart=4,
                      precondition=False, engine="device")
    u = np.asarray(r.u)
    assert np.isfinite(u).all()
    assert np.isfinite(float(r.final_res))
    assert np.isfinite(np.asarray(r.history)).all()
    # no Krylov direction exists: the iterate must stay at u0 = 0 and the
    # residual at ||rhs|| (not a NaN-contaminated fantasy)
    np.testing.assert_allclose(u, 0.0, atol=1e-12)
