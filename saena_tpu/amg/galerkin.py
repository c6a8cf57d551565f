"""Galerkin triple product, filtering, and sparsification (host, setup-time).

The reference computes Ac = R*A*P with a ring-pipelined distributed SpGEMM
(triple_mat_mult / matmat_CSC, saena_object_setup_matmat.cpp). Hierarchy
setup is host-side here, so the product is a sparse matmul; the device
ring-SpGEMM lives in saena_tpu/ops/spgemm.py for the standalone matmat path.

filter(): diagonal lumping of small entries (ref saena_object_setup2.cpp:
852-918) — dropped off-diagonal values are added to the diagonal so row sums
are preserved. Threshold schedule: filter_thre * 10^(filter_rate*(lvl -
filter_start)), capped at filter_max (ref saena_object.h:203-210).

sparsify_majid(): stochastic sparsifier keeping entries with probability
proportional to val^2 (diagonal always kept — cooEntry::get_val_sq returns
1e7 for the diagonal, data_struct.h:213-219; ref saena_object_sparsify.cpp).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _torch_csr(M: sp.csr_matrix):
    import torch
    M = M.tocsr()
    return torch.sparse_csr_tensor(
        torch.from_numpy(M.indptr.astype(np.int64)),
        torch.from_numpy(M.indices.astype(np.int64)),
        torch.from_numpy(M.data), size=M.shape)


def _spgemm(X: sp.csr_matrix, Y: sp.csr_matrix,
            nt: int = 0) -> sp.csr_matrix:
    """Host SpGEMM: the native Gustavson kernel when a toolchain exists
    (_native/spgemm.cpp — measured 2.2x torch-MKL / 2.6x scipy on the 48^3
    Poisson Galerkin levels), then torch's MKL-backed CPU kernel, then
    scipy. This is the setup-time stand-in for the reference's
    mkl_dcsrmultcsr fast_mm base case (saena_object_setup_matmat.cpp:214)."""
    from saena_tpu import _native

    Z = _native.spgemm_csr(X.tocsr(), Y.tocsr(), nt=nt)
    if Z is not None:
        return Z
    try:
        import torch
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            Z = torch.sparse.mm(_torch_csr(X), _torch_csr(Y))
        return sp.csr_matrix(
            (Z.values().numpy(), Z.col_indices().numpy(),
             Z.crow_indices().numpy()), shape=tuple(Z.shape))
    except Exception:
        return (X @ Y).tocsr()


def galerkin_product(R: sp.csr_matrix, A: sp.csr_matrix, P: sp.csr_matrix) -> sp.csr_matrix:
    Ac = _spgemm(R.tocsr(), _spgemm(A.tocsr(), P.tocsr()))
    Ac.sum_duplicates()
    Ac.sort_indices()
    return Ac


def filter_threshold(level: int, filter_thre: float, filter_max: float,
                     filter_start: int, filter_rate: int) -> float:
    if level < filter_start:
        return 0.0
    t = filter_thre * 10.0 ** (filter_rate * (level - filter_start))
    return min(t, filter_max)


def filter_lump(Ac: sp.csr_matrix, thre: float) -> sp.csr_matrix:
    """Drop |offdiag| < thre, lumping the dropped mass into the diagonal.
    Operates on the CSR arrays in place (no COO round-trip/CSR rebuild —
    those were ~2 s of the 48^3 setup on the multi-Mnnz coarse levels)."""
    if thre <= 0.0:
        return Ac
    Ac = Ac.tocsr()
    n = Ac.shape[0]
    rows = np.repeat(np.arange(n), np.diff(Ac.indptr))
    is_diag = rows == Ac.indices
    small = ~is_diag & (np.abs(Ac.data) < thre)
    if not small.any():
        return Ac
    lump = np.zeros(n)
    np.add.at(lump, rows[small], Ac.data[small])
    data = Ac.data.copy()
    data[small] = 0.0
    # canonical CSR has at most one diagonal entry per row; rows missing a
    # diagonal cannot absorb lumped mass in place (AMG operators always
    # carry full diagonals, but guard anyway)
    didx = np.flatnonzero(is_diag)
    data[didx] += lump[rows[didx]]
    missing = lump != 0
    missing[rows[didx]] = False
    # copy the structure arrays: eliminate_zeros() mutates them in place
    # and must not corrupt the caller's Ac
    out = sp.csr_matrix((data, Ac.indices.copy(), Ac.indptr.copy()),
                        shape=Ac.shape)
    if missing.any():
        out = (out + sp.diags(np.where(missing, lump, 0.0))).tocsr()
    out.eliminate_zeros()
    out.sort_indices()
    return out


def sparsify_majid(Ac: sp.csr_matrix, sample_sz_percent: float, seed: int = 0) -> sp.csr_matrix:
    """Keep ~sample_sz_percent of the off-diagonal entries, sampled with
    probability proportional to val^2; kept entries are NOT reweighted (the
    reference keeps original values); diagonal always kept."""
    if sample_sz_percent >= 1.0:
        return Ac
    coo = Ac.tocoo()
    offdiag = coo.row != coo.col
    n_off = int(offdiag.sum())
    target = int(sample_sz_percent * Ac.nnz)
    keep_off = max(0, target - (Ac.nnz - n_off))
    if keep_off >= n_off:
        return Ac
    w = coo.data[offdiag] ** 2
    p = w / w.sum()
    rng = np.random.default_rng(seed)
    sel = rng.choice(n_off, size=keep_off, replace=False, p=p)
    keep = ~offdiag
    off_idx = np.flatnonzero(offdiag)
    keep[off_idx[sel]] = True
    out = sp.csr_matrix((coo.data[keep], (coo.row[keep], coo.col[keep])), shape=Ac.shape)
    out.sort_indices()
    return out
