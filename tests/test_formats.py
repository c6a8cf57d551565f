"""Device format SpMV correctness vs scipy (the reference's test strategy
uses cross-library oracles; scipy is ours — SURVEY.md §4)."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from saena_tpu.generators import band_matrix, laplacian3D, random_symm_matrix
from saena_tpu.ops.formats import (
    DenseMatrix,
    DiaMatrix,
    EllMatrix,
    dense_from_csr,
    device_matrix_from_csr,
    dia_from_csr,
    ell_from_csr,
    pad_to,
)


def _spmv_check(A, dev, rtol=1e-12):
    n, m = A.shape
    rng = np.random.default_rng(0)
    x = rng.standard_normal(m)
    xp = jnp.asarray(np.pad(x, (0, pad_to(m) - m)))
    y = np.asarray(dev.matvec(xp))[:n]
    np.testing.assert_allclose(y, A @ x, rtol=rtol, atol=1e-12)


@pytest.mark.parametrize("conv", [ell_from_csr, dia_from_csr, dense_from_csr])
def test_spmv_band(conv):
    A = band_matrix(200, 5)
    _spmv_check(A, conv(A, dtype=jnp.float64))


def test_spmv_laplacian_ell():
    A = laplacian3D(8, 8, 8)
    _spmv_check(A, ell_from_csr(A, dtype=jnp.float64))


def test_spmv_laplacian_dia():
    A = laplacian3D(8, 8, 8)
    _spmv_check(A, dia_from_csr(A, dtype=jnp.float64))


def test_spmv_random():
    A = random_symm_matrix(300, 0.05, seed=1)
    _spmv_check(A, ell_from_csr(A, dtype=jnp.float64))


def test_ell_spill_path():
    # one long row forces the hybrid spill when width is quantile-capped
    A = random_symm_matrix(600, 0.02, seed=2).tolil()
    A[7, :150] = 1.5
    A = A.tocsr()
    dev = ell_from_csr(A, dtype=jnp.float64, width_quantile=0.9)
    assert dev.spill_rows.shape[0] > 0
    _spmv_check(A, dev)


def test_rectangular_ell():
    rng = np.random.default_rng(3)
    A = sp.random(130, 77, density=0.1, random_state=3, format="csr")
    _spmv_check(A, ell_from_csr(A, dtype=jnp.float64))


def test_format_selection():
    lap = laplacian3D(8, 8, 8)
    assert isinstance(device_matrix_from_csr(lap, dtype=jnp.float64), DiaMatrix)
    small_dense = random_symm_matrix(100, 0.5, seed=4)
    assert isinstance(device_matrix_from_csr(small_dense, dtype=jnp.float64), DenseMatrix)
    sparse_rand = random_symm_matrix(2000, 0.004, seed=5)
    assert isinstance(device_matrix_from_csr(sparse_rand, dtype=jnp.float64), EllMatrix)


def test_padding_preserved():
    A = laplacian3D(5, 5, 5)  # n=125, pad 128
    dev = ell_from_csr(A, dtype=jnp.float64)
    x = jnp.asarray(np.pad(np.ones(125), (0, 3)))
    y = dev.matvec(x)
    assert y.shape[0] == 128
    np.testing.assert_allclose(np.asarray(y)[125:], 0.0)


def test_bsr_matvec():
    from saena_tpu.ops.formats import bsr_from_csr

    A = laplacian3D(10, 10, 10)
    _spmv_check(A, bsr_from_csr(A, dtype=jnp.float64))


def test_bsr_matvec_irregular():
    from saena_tpu.ops.formats import bsr_from_csr

    A = random_symm_matrix(500, 0.02, seed=6)
    _spmv_check(A, bsr_from_csr(A, dtype=jnp.float64))


def test_bsr_rectangular():
    from saena_tpu.ops.formats import bsr_from_csr

    A = sp.random(260, 140, density=0.08, random_state=7, format="csr")
    _spmv_check(A, bsr_from_csr(A, dtype=jnp.float64))


def test_rcm_reduces_bsr_bytes():
    from saena_tpu.ops.formats import bsr_bytes_estimate, rcm_permutation
    from saena_tpu.amg.strength import find_aggregation
    from saena_tpu.amg.prolongation import smoothed_prolongator, restriction
    from saena_tpu.amg.galerkin import galerkin_product

    A = laplacian3D(14, 14, 14)
    agg, n_c, _ = find_aggregation(A, 0.3)
    P = smoothed_prolongator(A, agg, n_c)
    Ac = galerkin_product(restriction(P), A, P)
    before = bsr_bytes_estimate(Ac)
    p = rcm_permutation(Ac)
    after = bsr_bytes_estimate(Ac[p][:, p].tocsr())
    assert after <= before


def test_colpanels_matvec():
    """Column-panelled composite: matvec == scipy with x sliced per panel
    (the wide-x restriction fix; panels are exercised directly here with
    the real split logic on a synthetic wide matrix)."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    from saena_tpu.ops.formats import (
        ColPanels, _colpanel_bounds, _colpanel_parts, colpanels_from_csr,
        pad_to)

    # narrow x: no split
    assert _colpanel_bounds(1000, 4) is None
    # wide x: 128-aligned half-budget panels covering all columns
    bounds = _colpanel_bounds(2_000_000, 4)
    assert bounds is not None and bounds[0] == 0 and bounds[-1] == 2_000_000
    assert all(b % 128 == 0 for b in bounds[:-1])

    # functional check with a small forced split (parts built by hand
    # through the same builder; selection itself is TPU-only)
    rng = np.random.default_rng(5)
    A = sp.random(700, 3000, density=0.01, random_state=rng, format="csr")
    isz = 4
    import saena_tpu.ops.formats as F
    old = F.STRIP_X_VMEM
    F.STRIP_X_VMEM = 1024 * 4          # force ~3 panels of 512 cols
    try:
        M = colpanels_from_csr(A, dtype=jnp.float64)
    finally:
        F.STRIP_X_VMEM = old
    assert isinstance(M, ColPanels) and len(M.parts) >= 2
    x = rng.standard_normal(pad_to(A.shape[1]))
    y = np.asarray(M.matvec(jnp.asarray(x)))
    yref = A @ x[: A.shape[1]]
    n = A.shape[0]
    assert np.abs(y[:n] - yref).max() <= 1e-12 * max(1, np.abs(yref).max())
    assert np.abs(y[n:]).max() == 0.0
