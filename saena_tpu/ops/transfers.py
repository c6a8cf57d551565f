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

from saena_tpu.ops.formats import BSR_STREAM_BPS, _register, _static, pad_to
from saena_tpu.ops.pallas_strip_spmv import StripMatrix, strip_from_csr


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
    """Numerical symmetry check (host, setup-time). Memoized on the matrix
    object; coarsen_tail pre-sets the flag on Galerkin products of
    symmetric operators (R = P^T preserves symmetry to roundoff), so the
    O(nnz log nnz) transpose-compare runs once per hierarchy, not per
    level."""
    key = (A.shape, A.nnz)
    tok = getattr(A, "_saena_symmetric", None)
    if tok is not None and tok[0] == key:
        return tok[1]
    D = (A - A.T).tocoo()
    if D.nnz == 0:
        sym = True
    else:
        scale = np.abs(A.data).max() if A.nnz else 1.0
        sym = bool(np.abs(D.data).max() <= rtol * scale)
    try:
        A._saena_symmetric = (key, sym)
    except AttributeError:
        pass
    return sym


def device_bytes(M) -> int:
    return int(sum(x.nbytes for x in jax.tree.leaves(M)
                   if hasattr(x, "nbytes")))


def _strip_time(M_csr: sp.csr_matrix, dtype) -> float:
    """min estimated matvec seconds over the gather formats; inf if none
    is applicable (tentative P/Pt are one-entry-per-row — strip8's
    multi-strip tiles beat the single-strip layout ~3x on Pt^T, while Pt
    itself is usually near-diagonal and a coin toss; pick by estimate).
    Large operators route through the generic time-ranked picker so
    wide-x cases (Pt^T at multi-million-row fine levels) get column
    panels instead of falling off the fast paths; small ones keep the
    direct strip comparison (the picker has a 4096-nnz floor)."""
    from saena_tpu.ops.formats import gather_time_estimate
    from saena_tpu.ops.pallas_strip8_spmv import (
        strip8_supported, strip8_time_estimate)
    from saena_tpu.ops.pallas_strip_spmv import (
        strip_supported, strip_time_estimate)

    if M_csr.nnz >= 4096:
        return gather_time_estimate(M_csr, dtype)
    t = float("inf")
    if strip_supported(M_csr, dtype):
        t = strip_time_estimate(M_csr, dtype)
    if strip8_supported(M_csr, dtype):
        t = min(t, strip8_time_estimate(M_csr, dtype))
    return t


def _strip_build(M_csr: sp.csr_matrix, dtype):
    from saena_tpu.ops.formats import pick_gather_format
    from saena_tpu.ops.pallas_strip8_spmv import (
        strip8_from_csr, strip8_supported, strip8_time_estimate)
    from saena_tpu.ops.pallas_strip_spmv import (
        strip_supported, strip_time_estimate)

    if M_csr.nnz >= 4096:
        builder = pick_gather_format(M_csr, dtype)
        if builder is not None:
            return builder(M_csr, dtype=dtype)
    s_ok = strip_supported(M_csr, dtype)
    if strip8_supported(M_csr, dtype) and (
            not s_ok or strip8_time_estimate(M_csr, dtype)
            < strip_time_estimate(M_csr, dtype)):
        return strip8_from_csr(M_csr, dtype=dtype)
    return strip_from_csr(M_csr, dtype=dtype)


def build_structural(agg: np.ndarray, n_coarse: int, wq_host: np.ndarray,
                     Adev, P_nnz: int, dtype_l, dtype_next):
    """Build (SmoothedP, SmoothedR) from the aggregation map and smoothing
    diagonal. ``agg`` is post-RCM (column-permuted) when reordering ran."""
    n = agg.size
    Pt_csr = sp.csr_matrix(
        (np.ones(n), (np.arange(n), agg)), shape=(n, n_coarse))
    Pt = _strip_build(Pt_csr, dtype_l)
    PtT = _strip_build(Pt_csr.T.tocsr(), dtype_next)
    n_pad = pad_to(n)
    wq = jnp.asarray(np.pad(wq_host, (0, n_pad - n)), dtype=dtype_l)
    P = SmoothedP(Pt=Pt, A=Adev, wq=wq, shape=(n, n_coarse), nnz=P_nnz)
    R = SmoothedR(PtT=PtT, A=Adev, wq=wq, shape=(n_coarse, n), nnz=P_nnz)
    return P, R


def structural_estimate(agg: np.ndarray, n_coarse: int, Adev,
                        dtype_l) -> float:
    """Estimated seconds per (R then P) transfer pair for the structural
    path: two Pt-strip matvecs plus two A matvecs (stream-rate model for
    A; the strip kernels have their own op-bound models)."""
    n = agg.size
    Pt_csr = sp.csr_matrix(
        (np.ones(n), (np.arange(n), agg)), shape=(n, n_coarse))
    t_Pt = _strip_time(Pt_csr, dtype_l)
    t_PtT = _strip_time(Pt_csr.T.tocsr(), dtype_l)
    if not np.isfinite(t_Pt) or not np.isfinite(t_PtT):
        return float("inf")
    return t_Pt + t_PtT + 2 * device_bytes(Adev) / BSR_STREAM_BPS
