"""Structural (fused) SA transfer operators vs direct scipy P/R."""
import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from saena_tpu.core.coo import remove_boundary_nodes
from saena_tpu.generators import laplacian3D
from saena_tpu.amg.strength import find_aggregation
from saena_tpu.amg.prolongation import (
    restriction, smoothed_prolongator, smoothing_diag)
from saena_tpu.ops.formats import device_matrix_from_csr, pad_to
from saena_tpu.ops.transfers import (
    build_structural, is_symmetric, structural_estimate)


def _fixture(m=12, psmoother="jacobi"):
    A, *_ = remove_boundary_nodes(laplacian3D(m, m, m), np.zeros(m ** 3))
    agg, n_c, _ = find_aggregation(A, 0.3)
    P = smoothed_prolongator(A, agg, n_c, psmoother=psmoother)
    R = restriction(P)
    wq = smoothing_diag(A, psmoother=psmoother)
    Adev = device_matrix_from_csr(A, dtype=jnp.float64)
    return A, agg, n_c, P, R, wq, Adev


def test_structural_matches_direct():
    A, agg, n_c, P, R, wq, Adev = _fixture()
    n = A.shape[0]
    Pd, Rd = build_structural(agg, n_c, wq, Adev, int(P.nnz),
                              jnp.float64, jnp.float64)
    rng = np.random.default_rng(0)
    xc = rng.standard_normal(pad_to(n_c))
    xc[n_c:] = 0.0
    y = np.asarray(Pd.matvec(jnp.asarray(xc)))
    ref = P @ xc[:n_c]
    np.testing.assert_allclose(y[:n], ref, rtol=1e-12, atol=1e-12)
    assert np.all(y[n:] == 0.0)

    r = rng.standard_normal(pad_to(n))
    r[n:] = 0.0
    z = np.asarray(Rd.matvec(jnp.asarray(r)))
    refz = R @ r[:n]
    np.testing.assert_allclose(z[:n_c], refz, rtol=1e-12, atol=1e-12)
    assert np.all(z[n_c:] == 0.0)


def test_structural_spai():
    A, agg, n_c, P, R, wq, Adev = _fixture(psmoother="SPAI")
    n = A.shape[0]
    Pd, Rd = build_structural(agg, n_c, wq, Adev, int(P.nnz),
                              jnp.float64, jnp.float64)
    xc = np.random.default_rng(1).standard_normal(pad_to(n_c))
    xc[n_c:] = 0.0
    np.testing.assert_allclose(
        np.asarray(Pd.matvec(jnp.asarray(xc)))[:n], P @ xc[:n_c],
        rtol=1e-12, atol=1e-12)


def test_symmetry_gate():
    A, *_ = _fixture()
    assert is_symmetric(A[0] if isinstance(A, tuple) else A)
    B = sp.random(50, 50, density=0.2, random_state=0, format="csr")
    assert not is_symmetric(B)


def test_structural_estimate_smaller_on_poisson():
    """On stencil operators the fused path should stream fewer bytes than
    direct strip P/R (this is why it wins the format choice on TPU)."""
    from saena_tpu.ops.pallas_strip_spmv import strip_bytes_estimate
    A, agg, n_c, P, R, wq, Adev = _fixture(m=16)
    est_s = structural_estimate(agg, n_c, Adev, jnp.float64)
    est_d = (strip_bytes_estimate(P, jnp.float64)
             + strip_bytes_estimate(R, jnp.float64))
    assert est_s < est_d
