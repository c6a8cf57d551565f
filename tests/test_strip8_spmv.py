"""Multi-strip (strip8) Pallas SpMV: plan equivalence + matvec vs scipy."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from saena_tpu.ops.formats import pad_to
from saena_tpu.ops.pallas_strip8_spmv import (
    RPT8,
    Strip8Matrix,
    _plan8_numpy,
    strip8_bytes_estimate,
    strip8_from_csr,
    strip8_supported,
)


def _rand(n, m, d, seed):
    A = sp.random(n, m, density=d, random_state=np.random.default_rng(seed),
                  format="csr")
    A.sort_indices()
    return A


@pytest.mark.parametrize("n,m,d", [(500, 700, 0.02), (300, 300, 0.1),
                                   (1000, 260, 0.03), (129, 1300, 0.05),
                                   (1, 1, 1.0)])
def test_strip8_matches_scipy(n, m, d):
    A = _rand(n, m, d, seed=n + m)
    M = strip8_from_csr(A, dtype=jnp.float64)
    x = np.random.default_rng(0).standard_normal(pad_to(m))
    y = np.asarray(M.matvec(jnp.asarray(x)))
    yref = A @ x[:m]
    assert np.abs(y[:n] - yref).max() <= 1e-12 * max(1, np.abs(yref).max())
    # zero padding preserved (solve-path invariant)
    if y.size > n:
        assert np.abs(y[n:]).max() == 0.0


def test_strip8_native_plan_matches_numpy():
    from saena_tpu import _native

    if not _native.have_native():
        pytest.skip("no toolchain")
    for seed, (n, m, d) in enumerate([(500, 700, 0.02), (2000, 2000, 0.01),
                                      (97, 130, 0.3)]):
        A = _rand(n, m, d, seed)
        coo = A.tocoo()
        for perrow in (1, 2, 4):
            Q = 128 // perrow
            n_rb = pad_to(n, Q) // Q
            n_strips = pad_to(m) // 128
            nat = _native.strip8_plan_core(coo.row, coo.col, n_rb,
                                           n_strips, perrow)
            ref = _plan8_numpy(coo.row.astype(np.int64),
                               coo.col.astype(np.int64), n_rb, n_strips,
                               perrow)
            for a, b, name in zip(nat, ref, ["e_tile", "e_sub", "e_krem",
                                             "tile_strips", "rb_tiles"]):
                assert np.array_equal(a, b), (seed, perrow, name)


def test_strip8_transpose_fill_beats_strip():
    """The motivating case: an aggregation transpose Pt^T (one entry per
    COLUMN) caps the single-strip layout at 12.5% tile fill; strip8 must
    pack it several times denser (= proportionally fewer streamed bytes)."""
    from saena_tpu.ops.pallas_strip_spmv import strip_bytes_estimate

    rng = np.random.default_rng(5)
    n_fine = 16384
    agg = np.sort(rng.integers(0, n_fine // 8, n_fine))
    Pt = sp.csr_matrix((np.ones(n_fine), (np.arange(n_fine), agg)),
                       shape=(n_fine, n_fine // 8))
    PtT = Pt.T.tocsr()
    PtT.sort_indices()
    e8 = strip8_bytes_estimate(PtT)
    e1 = strip_bytes_estimate(PtT)
    assert e8 * 2 <= e1, (e8, e1)
    # and it is still exact
    M = strip8_from_csr(PtT, dtype=jnp.float64)
    x = rng.standard_normal(pad_to(n_fine))
    y = np.asarray(M.matvec(jnp.asarray(x)))
    yref = PtT @ x[:n_fine]
    assert np.abs(y[:PtT.shape[0]] - yref).max() <= 1e-12 * np.abs(yref).max()


def test_strip8_smooth_dtype_twin():
    A = _rand(400, 400, 0.05, seed=2)
    M, Ms = strip8_from_csr(A, dtype=jnp.float64,
                            smooth_dtype=jnp.bfloat16)
    assert Ms.dtype == jnp.bfloat16
    assert Ms.idx is M.idx  # index arrays shared
    x = np.random.default_rng(1).standard_normal(pad_to(400))
    y = np.asarray(Ms.matvec(jnp.asarray(x)), dtype=np.float64)
    yref = A @ x[:400]
    scale = max(1.0, np.abs(yref).max())
    assert np.abs(y[:400] - yref).max() <= 0.05 * scale  # bf16 tolerance


def test_strip8_interval_mode_exact():
    """Force the interval layout (consecutive 8-strip tiles, one dynamic
    slice load) and check exactness against scipy."""
    from saena_tpu import _native
    from saena_tpu.ops.pallas_strip8_spmv import _plan8_one

    if not _native.have_native():
        pytest.skip("no toolchain")
    rng = np.random.default_rng(11)
    n, m = 700, 900
    A = sp.random(n, m, density=0.03, random_state=rng, format="csr")
    A.sort_indices()
    coo = A.tocoo()
    for perrow in (1, 2, 4):
        p = _plan8_one(coo, n, m, perrow, "interval")
        assert p is not None
        A2 = A.copy()
        A2.sort_indices()
        A2._saena_strip8_plan = ((A2.shape, A2.nnz), (coo, p))
        M = strip8_from_csr(A2, dtype=jnp.float64)
        assert M.mode == "interval" and M.perrow == perrow
        x = rng.standard_normal(pad_to(m))
        y = np.asarray(M.matvec(jnp.asarray(x)))
        yref = A @ x[:m]
        assert np.abs(y[:n] - yref).max() <= 1e-12 * max(1, np.abs(yref).max())


def test_strip8_supported_uses_planned_tiles():
    """The SMEM gate must use the PLANNED tile count, not the nnz/8 upper
    bound: dense-ish mid-level operators pack many entries per tile, and
    the bound wrongly exiled exactly the operators strip8 is ~2x fastest
    on (48^3 lean level-1 A, VERDICT perf profile)."""
    from saena_tpu.generators import band_matrix
    from saena_tpu.ops.pallas_strip8_spmv import GROUP8, _plan8

    A = band_matrix(2000, 60).tocsr()          # ~240k nnz, few wide rows
    n_tiles_ub = A.nnz // 8 + pad_to(A.shape[0], RPT8) // RPT8 + GROUP8
    assert n_tiles_ub * 8 * 4 >= 512 * 1024    # the old bound said no
    assert strip8_supported(A)                 # the plan says yes
    plan = _plan8(A)[1]
    n_tiles = max(GROUP8, -(-plan[3].shape[0] // GROUP8) * GROUP8)
    per_tile = 4 if plan[8] == "interval" else 32
    assert n_tiles * per_tile < 512 * 1024
    # and the format still computes correctly at that size
    M = strip8_from_csr(A, dtype=jnp.float64)
    x = np.random.default_rng(1).standard_normal(pad_to(A.shape[1]))
    y = np.asarray(M.matvec(jnp.asarray(x)))
    yref = A @ x[: A.shape[1]]
    assert np.abs(y[: A.shape[0]] - yref).max() <= 1e-11 * np.abs(yref).max()


def test_strip8_row_panels():
    """SMEM-gated operators split into row panels (RowPanels composite):
    matvec == scipy, panel boundaries 128-aligned, padding preserved."""
    from saena_tpu.ops.formats import RowPanels
    from saena_tpu.ops.pallas_strip8_spmv import (
        strip8_panel_slices, strip8_panels_from_csr,
        strip8_panels_time_estimate, strip8_panels_bytes_estimate)

    from saena_tpu.ops import pallas_strip8_spmv as s8

    A = _rand(1500, 900, 0.03, seed=11)
    # a budget between the full-size prefetch cost and half of it, so one
    # call fails but 2+ row panels pass (mirrors the 512 KB gate at scale)
    plan = s8._plan8(A)[1]
    n_tiles = max(s8.GROUP8, -(-plan[3].shape[0] // s8.GROUP8) * s8.GROUP8)
    per_tile = 4 if plan[8] == "interval" else 32
    budget = int(n_tiles * per_tile * 0.75)
    assert not strip8_supported(A, jnp.float64, smem_budget=budget)
    parts = strip8_panel_slices(A, jnp.float64, smem_budget=budget)
    assert parts is not None and len(parts) >= 2
    assert sum(p.shape[0] for p in parts) == A.shape[0]
    M = strip8_panels_from_csr(A, dtype=jnp.float64)
    assert isinstance(M, RowPanels)
    x = np.random.default_rng(1).standard_normal(pad_to(A.shape[1]))
    y = np.asarray(M.matvec(jnp.asarray(x)))
    yref = A @ x[: A.shape[1]]
    n = A.shape[0]
    assert np.abs(y[:n] - yref).max() <= 1e-12 * max(1, np.abs(yref).max())
    assert y.size == pad_to(n) and np.abs(y[n:]).max() == 0.0
    # smooth twin shares index arrays, reduces values only
    M32, Msm = strip8_panels_from_csr(A, dtype=jnp.float32,
                                      smooth_dtype=jnp.bfloat16)
    assert Msm.dtype == jnp.bfloat16 and Msm.nnz == M32.nnz
    assert strip8_panels_time_estimate(A) > 0
    assert strip8_panels_bytes_estimate(A) > 0


def test_sampled_sweep_pick_consistency(monkeypatch):
    """The stratified-sample candidate ranking (SAMPLE_SWEEP_NNZ gate) must
    (a) produce a VALID plan whose matvec is exact, and (b) pick a layout
    whose planner cost is within 25% of the full 6-candidate sweep's
    winner — sampling is perf-only, never correctness."""
    import scipy.sparse as sp

    from saena_tpu.core.coo import remove_boundary_nodes
    from saena_tpu.generators import laplacian3D
    from saena_tpu.ops import pallas_strip8_spmv as s8

    A0 = laplacian3D(20, 20, 20)
    A, *_ = remove_boundary_nodes(A0, np.zeros(20 ** 3))
    A = (A + 0.01 * sp.random(A.shape[0], A.shape[0], density=0.0005,
                              random_state=5, format="csr")).tocsr()
    A = (A + A.T).tocsr()
    A.sort_indices()
    assert A.nnz > 20_000

    def plan_cost(M):
        res = s8._plan8(M.tocsr())
        assert res is not None
        coo, p = res
        w = (s8._COST_INTERVAL if p[8] == "interval" else s8._COST_GENERAL)
        return p[3].shape[0] * w, (p[7], p[8])

    # full sweep (gate above nnz)
    monkeypatch.setattr(s8, "SAMPLE_SWEEP_NNZ", 10 ** 12)
    cost_full, pick_full = plan_cost(A.copy())
    # sampled sweep (gate below nnz)
    monkeypatch.setattr(s8, "SAMPLE_SWEEP_NNZ", 1)
    As = A.copy()
    cost_samp, pick_samp = plan_cost(As)
    assert cost_samp <= 1.25 * cost_full, (pick_full, pick_samp,
                                           cost_full, cost_samp)
    # the sampled winner's FULL plan yields an exact matvec
    S = s8.strip8_from_csr(As, dtype=jnp.float64)
    x = np.random.default_rng(0).standard_normal(S.n_cols_pad
                                                 if hasattr(S, "n_cols_pad")
                                                 else A.shape[1])
    from saena_tpu.ops.formats import pad_to
    xp = np.zeros(pad_to(A.shape[1])); xp[:A.shape[1]] = x[:A.shape[1]]
    y = np.asarray(S.matvec(jnp.asarray(xp)))[:A.shape[0]]
    np.testing.assert_allclose(y, A @ xp[:A.shape[1]], rtol=1e-12)
