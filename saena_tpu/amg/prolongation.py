"""Smoothed-aggregation prolongation/restriction (host, setup-time).

P = (I - omega * Q * A) * P_t with Q = D^{-1} (jacobi) or the SPAI diagonal
(ref SA(), saena_object_setup1.cpp:8-254). R = P^T — the reference builds it
by shipping transposed COO entries across ranks (restrict_matrix.cpp:10-130);
on host it is a transpose.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

ALMOST_ZERO = 1e-14  # ref: data_struct.h:41


def tentative_prolongator(agg: np.ndarray, n_coarse: int) -> sp.csr_matrix:
    """P_t[i, agg[i]] = 1."""
    n = agg.size
    return sp.csr_matrix(
        (np.ones(n), (np.arange(n), agg)), shape=(n, n_coarse)
    )


def smoothing_diag(
    A: sp.csr_matrix,
    omega: float = 2.0 / 3.0,
    psmoother: str = "jacobi",
) -> np.ndarray:
    """wq = omega * diag(Q) of the prolongation smoother.

    jacobi: Q = D^{-1}, omega as given (ref :102).
    SPAI:   Q_i = d_i / sum_j a_ij^2, omega = 4 / (3 * max_i sum_j |a_ij|)
            (ref :110-136)."""
    diag = A.diagonal()
    if psmoother == "jacobi":
        q = np.where(diag != 0, 1.0 / np.where(diag == 0, 1.0, diag), 0.0)
        w = omega
    elif psmoother == "SPAI":
        sq = np.asarray(A.multiply(A).sum(axis=1)).ravel()
        absrow = np.asarray(abs(A).sum(axis=1)).ravel()
        q = np.where(sq != 0, diag / np.where(sq == 0, 1.0, sq), 0.0)
        w = 4.0 / (3.0 * absrow.max())
    else:
        raise ValueError(f"unknown PSmoother {psmoother!r}")
    return w * q


def smoothed_prolongator(
    A: sp.csr_matrix,
    agg: np.ndarray,
    n_coarse: int,
    omega: float = 2.0 / 3.0,
    psmoother: str = "jacobi",
) -> sp.csr_matrix:
    """P = (I - omega Q A) P_t (see smoothing_diag for Q and omega)."""
    # NOTE: this product stays on scipy verbatim — its accumulation order
    # (including the UNSORTED intermediate diags@A entry order) feeds the
    # P values, and a ~1-ulp reordering is enough to move the iteration
    # count of barely-converging goldens (SiH4: 144 vs 142). The native
    # Gustavson engine carries the Galerkin RAP instead (bitwise-identical
    # to the torch path there, verified on SiH4).
    wq = smoothing_diag(A, omega, psmoother)
    q, w = wq, 1.0
    Pt = tentative_prolongator(agg, n_coarse)
    QA = sp.diags(q) @ A
    P = (Pt - w * (QA @ Pt)).tocsr()
    P.data[np.abs(P.data) < ALMOST_ZERO] = 0.0
    P.eliminate_zeros()
    P.sort_indices()
    return P


def restriction(P: sp.csr_matrix) -> sp.csr_matrix:
    """R = P^T (restrict_matrix::transposeP)."""
    R = P.transpose().tocsr()
    R.sort_indices()
    return R
