"""Pallas DIA SpMV (interpret mode on CPU) vs scipy."""
import numpy as np
import pytest
import scipy.sparse as sp

from saena_tpu.generators import laplacian3D, band_matrix
from saena_tpu.core.coo import remove_boundary_nodes
from saena_tpu.ops.formats import dia_from_csr
from saena_tpu.ops.pallas_dia_spmv import dia_spmv, dia_supported


def _check(A):
    D = dia_from_csr(A)
    assert dia_supported(D.offsets, D.n_pad, D.dtype)
    rng = np.random.default_rng(0)
    x = np.pad(rng.standard_normal(A.shape[0]), (0, D.n_pad - A.shape[0]))
    y = np.asarray(dia_spmv(D.data, x.astype(np.float32), D.offsets,
                            interpret=True))
    ref = A @ x[: A.shape[0]]
    np.testing.assert_allclose(y[: A.shape[0]], ref, rtol=2e-5, atol=2e-5)
    assert (y[A.shape[0]:] == 0).all()      # zero padding preserved


def test_poisson_interior():
    A0 = laplacian3D(10, 10, 10)
    A, *_ = remove_boundary_nodes(A0, np.ones(A0.shape[0]))
    _check(A)


def test_band():
    _check(band_matrix(900, 3))


def test_wide_offsets_cross_tile():
    # offsets straddling multiple 128-lane rows and the 256-row tile
    n = 2000
    diags = [0, 1, -1, 300, -300, 1500, -1500]
    A = sp.diags([np.random.default_rng(k).standard_normal(n - abs(d))
                  for k, d in enumerate(diags)], diags, format="csr")
    _check(A)


def test_unsupported_dtypes_and_sizes():
    import jax.numpy as jnp
    from saena_tpu.ops.pallas_dia_spmv import _whole_supported, dia_panels
    assert dia_supported((0, 1), 128, jnp.bfloat16)   # bf16 DATA streams
    assert not dia_supported((0, 1), 128, jnp.float16)  # f16 does not
    # x beyond the one-call VMEM budget: whole fails, panels carry it
    assert not _whole_supported((0, 1), 128 * 40000, jnp.float32)
    assert dia_supported((0, 1), 128 * 40000, jnp.float32)
    panels = dia_panels((0, 1), 128 * 40000, "float32")
    assert panels is not None and len(panels) >= 2
    assert sum(bp for _, bp, *_ in panels) == 128 * 40000
    # rectangular (sharded) calls never panel
    assert not dia_supported((0, 1), 128 * 40000, jnp.float32,
                             m_pad=128 * 40010)


def test_panelled_large_square():
    """Multi-million-row stencil through the row-panel decomposition:
    each panel is a rectangular kernel call on its band window of x
    (the fix for 2M-row fine levels falling off the Pallas path)."""
    import jax.numpy as jnp
    from saena_tpu.ops.pallas_dia_spmv import (
        _whole_supported, dia_fused_update)

    n = 1_600_000
    diags = [0, 1, -1, 5000, -5000]
    rng = np.random.default_rng(7)
    A = sp.diags([rng.standard_normal(n - abs(d)) for d in diags],
                 diags, format="csr")
    D = dia_from_csr(A)
    assert not _whole_supported(D.offsets, D.n_pad, D.dtype)
    assert dia_supported(D.offsets, D.n_pad, D.dtype)
    x = np.pad(rng.standard_normal(n), (0, D.n_pad - n)).astype(np.float32)
    y = np.asarray(dia_spmv(D.data, x, D.offsets, interpret=True))
    ref = A @ x[:n]
    np.testing.assert_allclose(y[:n], ref, rtol=2e-4, atol=2e-4)
    assert (y[n:] == 0).all()
    # fused jacobi sweep panelled: x + w*dinv*(rhs - Ax)
    rhs = np.pad(rng.standard_normal(n), (0, D.n_pad - n)).astype(np.float32)
    dg = A.diagonal()
    dg[dg == 0] = 1.0
    dinv = np.pad(1.0 / dg, (0, D.n_pad - n)).astype(np.float32)
    yf = np.asarray(dia_fused_update(D.data, x, rhs, D.offsets,
                                     dinv=dinv, c=2 / 3, interpret=True))
    reff = x[:n] + (2 / 3) * dinv[:n] * (rhs[:n] - ref)
    np.testing.assert_allclose(yf[:n], reff, rtol=2e-4, atol=2e-4)


def test_bf16_data_kernel_and_twin():
    """bf16-stored diagonals through the same kernel: f32 x/accumulator,
    values rounded once at conversion (the smooth_dtype twin discipline —
    halves the dominant HBM term of stencil smoothing)."""
    import jax.numpy as jnp

    A0 = laplacian3D(9, 9, 9)
    A, *_ = remove_boundary_nodes(A0, np.ones(A0.shape[0]))
    D, Dsm = dia_from_csr(A, smooth_dtype=jnp.bfloat16)
    assert Dsm.dtype == jnp.bfloat16
    assert Dsm.offsets == D.offsets
    assert dia_supported(Dsm.offsets, Dsm.n_pad, Dsm.dtype)
    n = A.shape[0]
    rng = np.random.default_rng(3)
    x = np.pad(rng.standard_normal(n), (0, D.n_pad - n)).astype(np.float32)
    y = np.asarray(dia_spmv(Dsm.data, jnp.asarray(x), Dsm.offsets,
                            interpret=True))
    assert y.dtype == np.float32
    ref = A @ x[:n]                       # exact A times x
    bf = A.copy().astype(np.float32)
    bf.data = np.asarray(jnp.asarray(bf.data).astype(jnp.bfloat16)
                         .astype(jnp.float32))
    ref_bf = bf @ x[:n]
    np.testing.assert_allclose(y[:n], ref_bf, rtol=2e-5, atol=2e-5)
    assert np.abs(y[:n] - ref).max() < 0.01 * max(1.0, np.abs(ref).max())
    assert (y[n:] == 0).all()
    # fused smoother step with bf16 data
    from saena_tpu.ops.pallas_dia_spmv import dia_fused_update

    rhs = np.pad(rng.standard_normal(n), (0, D.n_pad - n)).astype(np.float32)
    dinv = np.pad(1.0 / A.diagonal(), (0, D.n_pad - n)).astype(np.float32)
    yf = np.asarray(dia_fused_update(Dsm.data, jnp.asarray(x),
                                     jnp.asarray(rhs), Dsm.offsets,
                                     dinv=jnp.asarray(dinv), c=2 / 3,
                                     interpret=True))
    reff = x[:n] + (2 / 3) * dinv[:n] * (rhs[:n] - ref_bf)
    np.testing.assert_allclose(yf[:n], reff, rtol=2e-5, atol=2e-5)


def test_fused_update_variants():
    import jax.numpy as jnp
    from saena_tpu.ops.pallas_dia_spmv import dia_fused_update

    A0 = laplacian3D(8, 8, 8)
    A, *_ = remove_boundary_nodes(A0, np.ones(A0.shape[0]))
    D = dia_from_csr(A)
    n = A.shape[0]
    rng = np.random.default_rng(1)
    x = np.pad(rng.standard_normal(n), (0, D.n_pad - n)).astype(np.float32)
    rhs = np.pad(rng.standard_normal(n), (0, D.n_pad - n)).astype(np.float32)
    dinv = np.pad(1.0 / A.diagonal(), (0, D.n_pad - n)).astype(np.float32)

    Ax = A @ x[:n]
    # jacobi sweep: x + w*dinv*(rhs - Ax)
    y = np.asarray(dia_fused_update(D.data, x, rhs, D.offsets,
                                    dinv=dinv, c=2/3, interpret=True))
    ref = x[:n] + (2/3) * dinv[:n] * (rhs[:n] - Ax)
    np.testing.assert_allclose(y[:n], ref, rtol=2e-5, atol=2e-5)
    assert (y[n:] == 0).all()
    # reference-sign residual: -(rhs - Ax) = Ax - rhs
    y = np.asarray(dia_fused_update(D.data, x, rhs, D.offsets,
                                    c=-1.0, add_x=False, interpret=True))
    np.testing.assert_allclose(y[:n], Ax - rhs[:n], rtol=2e-5, atol=2e-5)
    # chebyshev scaled residual: c*dinv*(rhs - Ax)
    y = np.asarray(dia_fused_update(D.data, x, rhs, D.offsets, dinv=dinv,
                                    c=0.37, add_x=False, interpret=True))
    np.testing.assert_allclose(y[:n], 0.37 * dinv[:n] * (rhs[:n] - Ax),
                               rtol=2e-5, atol=2e-5)


def test_dia_matrix_fused_update_fallback():
    """DiaMatrix.fused_update on CPU (XLA fallback) equals the expression."""
    import jax.numpy as jnp
    A0 = laplacian3D(6, 6, 6)
    A, *_ = remove_boundary_nodes(A0, np.ones(A0.shape[0]))
    D = dia_from_csr(A)
    n = A.shape[0]
    rng = np.random.default_rng(2)
    x = jnp.asarray(np.pad(rng.standard_normal(n), (0, D.n_pad - n)),
                    jnp.float32)
    rhs = jnp.asarray(np.pad(rng.standard_normal(n), (0, D.n_pad - n)),
                      jnp.float32)
    dinv = jnp.asarray(np.pad(1.0 / A.diagonal(), (0, D.n_pad - n)),
                       jnp.float32)
    y = np.asarray(D.fused_update(x, rhs, dinv=dinv, c=0.5))
    ref = np.asarray(x) + 0.5 * np.asarray(dinv) * (
        np.asarray(rhs) - np.asarray(D.matvec(x)))
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5)


def test_wide_stencil_galerkin_level():
    """~100-diagonal Galerkin coarse operator through the adaptive-tile
    kernel (the case that unlocks DIA for AMG mid levels)."""
    import jax.numpy as jnp
    from saena_tpu.config import Options
    from saena_tpu.amg import hierarchy as H
    from saena_tpu.ops.pallas_dia_spmv import _plan

    A0 = laplacian3D(14, 14, 14)
    A, *_ = remove_boundary_nodes(A0, np.ones(A0.shape[0]))
    hier, info = H.setup(A, Options(), dtype=jnp.float32)
    A1 = info.csr_levels[1]
    D = dia_from_csr(A1)
    assert len(D.offsets) > 40          # wide: past the XLA-path diag cap
    R, grid, lo128, Rp, tr = _plan(D.offsets, D.n_pad)
    assert tr >= 8
    _check(A1)
