"""Pallas strip-gather SpMV (interpret mode on CPU) vs scipy."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from saena_tpu.generators import laplacian3D, random_symm_matrix
from saena_tpu.core.coo import remove_boundary_nodes
from saena_tpu.ops.pallas_strip_spmv import (
    ROWS_PER_TILE, StripMatrix, strip_from_csr, strip_spmv)


def _check(A, rtol=1e-12):
    A = A.tocsr()
    S = strip_from_csr(A, dtype=jnp.float64)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(S.n_cols_pad))
    y = strip_spmv(S, x, interpret=True)
    ref = A @ np.asarray(x)[: A.shape[1]]
    np.testing.assert_allclose(np.asarray(y)[: A.shape[0]], ref,
                               rtol=rtol, atol=1e-12)
    return S


def test_strip_laplacian():
    A, *_ = remove_boundary_nodes(laplacian3D(10, 10, 10), np.zeros(1000))
    _check(A)


def test_strip_random():
    _check(random_symm_matrix(600, 0.02, seed=3))


def test_strip_rectangular():
    _check(sp.random(500, 300, density=0.05, random_state=7, format="csr"))


def test_strip_replica_overflow():
    """A row with >PERROW entries in one strip spills to replica pairs."""
    A = random_symm_matrix(400, 0.005, seed=9) + sp.csr_matrix(
        (np.ones(200), (np.full(200, 7), np.arange(200))), shape=(400, 400))
    S = _check(A.tocsr())
    # replicas mean more pairs than distinct (rowblk, strip) combos
    assert S.idx.shape[0] > 0


def test_strip_compact_storage():
    """Strip storage beats the 8x128 BSR footprint on SA-like operators."""
    from saena_tpu.ops.formats import bsr_bytes_estimate
    from saena_tpu.amg.strength import find_aggregation
    from saena_tpu.amg.prolongation import smoothed_prolongator, restriction
    from saena_tpu.amg.galerkin import galerkin_product

    A, *_ = remove_boundary_nodes(laplacian3D(16, 16, 16), np.zeros(16**3))
    agg, n_c, _ = find_aggregation(A, 0.3)
    P = smoothed_prolongator(A, agg, n_c)
    Ac = galerkin_product(restriction(P), A, P)
    S = strip_from_csr(Ac, dtype=jnp.float32)
    strip_bytes = S.idx.nbytes + S.vals.nbytes
    assert strip_bytes < bsr_bytes_estimate(Ac, jnp.float32)


def test_strip_perrow16_padded_output():
    """perrow=16 (rpt=64) layouts can leave n_rows_pad a non-multiple of 128;
    matvec must still return the caller's 128-padded length (ADVICE r1:
    320x8192 -> krb=1 gave len(y)=320 < pad_to(320)=384)."""
    from saena_tpu.ops.formats import pad_to

    A = sp.random(320, 8192, density=0.002, random_state=11, format="csr")
    S = strip_from_csr(A, dtype=jnp.float64, perrow=16)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(S.n_cols_pad))
    y = S.matvec(x)
    assert y.shape[0] == pad_to(320) == S.n_pad
    ref = A @ np.asarray(x)[: A.shape[1]]
    np.testing.assert_allclose(np.asarray(y)[:320], ref, rtol=1e-12, atol=1e-12)
    assert not np.any(np.asarray(y)[320:])
