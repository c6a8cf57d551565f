"""Structural (fused) smoothed-aggregation transfer operators.

The SA prolongator is P = (I - omega Q A) P_t (ref SA(),
saena_object_setup1.cpp:8-254), so its matvec decomposes into the tentative
operator P_t (ONE nonzero per fine row — a near-trivial strip SpMV) plus one
matvec with the LEVEL's A, which already has the fastest format available
(DIA/strip/BSR/dense):

    P  x = g - wq * (A g),          g = P_t x
    R  r = P_t^T (r - A (wq * r))   [A symmetric, R = P^T]

with wq = omega * diag(Q). On TPU this beats storing/streaming the smoothed
P and R directly: the direct strip layouts of P (4 nnz/row) and R (wide
rows) pack at 7-50% fill, while P_t / P_t^T pack densely and A's operator
reuses its own optimal kernel (measured: 57 MB of streamed transfer tiles
-> 13 MB on the 97k-row 3-D Poisson level 0). Setup verifies the level's A
is numerically symmetric before choosing this path; lazy updates
(update1/2/3) fall back to direct P/R strips because the identity ties P to
the A it was smoothed with.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from saena_tpu.ops.formats import _register, _static, pad_to
from saena_tpu.ops.pallas_strip_spmv import (
    StripMatrix, strip_bytes_estimate, strip_from_csr, strip_supported)


@_register
@dataclasses.dataclass(frozen=True)
class SmoothedP:
    """P = (I - omega Q A) P_t applied structurally."""

    Pt: StripMatrix          # (n_fine, n_coarse), the tentative prolongator
    A: object                # the level's DeviceMatrix (shared pytree node)
    wq: jax.Array            # (n_fine_pad,) omega * diag(Q), level dtype
    shape: tuple = _static()
    nnz: int = _static()

    @property
    def dtype(self):
        return self.Pt.dtype

    @property
    def n_pad(self) -> int:
        return self.Pt.n_pad

    def matvec(self, x: jax.Array) -> jax.Array:
        g = self.Pt.matvec(x)
        return g - self.wq * self.A.matvec(g)

    def astype(self, dtype) -> "SmoothedP":
        return dataclasses.replace(
            self, Pt=self.Pt.astype(dtype), wq=self.wq.astype(dtype))


@_register
@dataclasses.dataclass(frozen=True)
class SmoothedR:
    """R = P^T = P_t^T (I - omega A Q) applied structurally (A symmetric)."""

    PtT: StripMatrix         # (n_coarse, n_fine), at the COARSE level dtype
    A: object
    wq: jax.Array
    shape: tuple = _static()
    nnz: int = _static()

    @property
    def dtype(self):
        return self.PtT.dtype

    @property
    def n_pad(self) -> int:
        return self.PtT.n_pad

    def matvec(self, r: jax.Array) -> jax.Array:
        z = r - self.A.matvec(self.wq * r)
        return self.PtT.matvec(z)

    def astype(self, dtype) -> "SmoothedR":
        return dataclasses.replace(self, PtT=self.PtT.astype(dtype))


def is_symmetric(A: sp.spmatrix, rtol: float = 1e-12) -> bool:
    """Numerical symmetry check (host, setup-time)."""
    D = (A - A.T).tocoo()
    if D.nnz == 0:
        return True
    scale = np.abs(A.data).max() if A.nnz else 1.0
    return bool(np.abs(D.data).max() <= rtol * scale)


def device_bytes(M) -> int:
    return int(sum(x.nbytes for x in jax.tree.leaves(M)
                   if hasattr(x, "nbytes")))


def build_structural(agg: np.ndarray, n_coarse: int, wq_host: np.ndarray,
                     Adev, P_nnz: int, dtype_l, dtype_next):
    """Build (SmoothedP, SmoothedR) from the aggregation map and smoothing
    diagonal. ``agg`` is post-RCM (column-permuted) when reordering ran."""
    n = agg.size
    Pt_csr = sp.csr_matrix(
        (np.ones(n), (np.arange(n), agg)), shape=(n, n_coarse))
    Pt = strip_from_csr(Pt_csr, dtype=dtype_l)
    PtT = strip_from_csr(Pt_csr.T.tocsr(), dtype=dtype_next)
    n_pad = pad_to(n)
    wq = jnp.asarray(np.pad(wq_host, (0, n_pad - n)), dtype=dtype_l)
    P = SmoothedP(Pt=Pt, A=Adev, wq=wq, shape=(n, n_coarse), nnz=P_nnz)
    R = SmoothedR(PtT=PtT, A=Adev, wq=wq, shape=(n_coarse, n), nnz=P_nnz)
    return P, R


def structural_estimate(agg: np.ndarray, n_coarse: int, Adev,
                        dtype_l) -> int:
    """Streamed bytes per (R then P) transfer pair for the structural path."""
    n = agg.size
    Pt_csr = sp.csr_matrix(
        (np.ones(n), (np.arange(n), agg)), shape=(n, n_coarse))
    if not (strip_supported(Pt_csr, dtype_l)
            and strip_supported(Pt_csr.T, dtype_l)):
        return 1 << 62
    return (strip_bytes_estimate(Pt_csr, dtype_l)
            + strip_bytes_estimate(Pt_csr.T.tocsr(), dtype_l)
            + 2 * device_bytes(Adev))
