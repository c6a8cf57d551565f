"""Strength-of-connection graph and MIS(1) aggregation (host, setup-time).

The reference computes these with distributed halo exchanges
(create_strength_matrix saena_object_setup1.cpp:520-719, aggregation_1_dist
:724-995 — an iterative min-index propagation from Olson's "Exposing
fine-grained parallelism in AMG"). Setup runs on the host here: the same
fixpoint is evaluated with vectorized numpy rounds (each round is exactly one
reference while-iteration), so the resulting aggregates — and therefore the
hierarchy and iteration counts — match the reference's semantics.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from saena_tpu import _native


def _row_reduce(ufunc, vals, rows, n, identity):
    """Per-row ufunc reduction of (rows, vals) pairs with rows NOT assumed
    sorted — sorts once, then uses reduceat (ufunc.at is ~20x slower).
    CSR-derived COO rows are already sorted; the O(nnz) check skips the
    O(nnz log nnz) argsort on every multi-Mnnz coarse level."""
    if vals.size == 0:
        return np.full(n, identity)
    if rows.size > 1 and (rows[1:] >= rows[:-1]).all():
        rs, vs = rows, vals
    else:
        order = np.argsort(rows, kind="stable")
        rs, vs = rows[order], vals[order]
    starts = np.searchsorted(rs, np.arange(n))
    out = np.full(n, identity, dtype=vals.dtype if vals.dtype.kind == "f" else np.float64)
    nonempty = starts < vs.size
    # reduceat mis-handles empty segments (returns vs[start]); mask them out
    seg = ufunc.reduceat(vs, np.minimum(starts, vs.size - 1))
    counts = np.diff(np.append(starts, vs.size))
    valid = nonempty & (counts > 0)
    out[valid] = seg[valid]
    return out


def _row_min_indices(cand, starts, counts, n, big):
    """Min of cand per row for presorted-by-row entries."""
    out = np.full(n, big, dtype=np.int64)
    valid = counts > 0
    seg = np.minimum.reduceat(cand, np.minimum(starts, max(cand.size - 1, 0))) \
        if cand.size else out
    if cand.size:
        out[valid] = seg[valid]
    return out


def strength_graph(A: sp.csr_matrix, theta: float) -> sp.csr_matrix:
    """S_ij = -a_ij / max_{k != i}(-a_ik); keep entries where S_ij > theta or
    S_ji > theta (union symmetrization, strength_matrix.cpp:233-271).
    Returns a boolean-pattern CSR without the diagonal.

    Built directly on the CSR arrays: the kept entries are a subset of A's
    entries in CSR order, so S's indptr is a masked per-row count and its
    indices a single boolean gather — no COO round-trip and no coo→csr sort
    (those were ~60% of strength time on multi-Mnnz levels).

    S inherits A's duplicates: a non-canonical A (duplicate column entries)
    yields an S with duplicate indices. Current consumers (the MIS pattern
    walk, T.T@S@T) tolerate that; call sum_duplicates upstream if a future
    consumer assumes canonical CSR."""
    A = A.tocsr()
    if not A.has_sorted_indices:
        # sort a COPY: sorting in place would reorder the caller's
        # indices/data arrays as a side effect (host CSRs are kept
        # entry-order-stable for lazy value updates)
        A = A.copy()
        A.sort_indices()      # keeps S canonical (entries already row-major)
    n = A.shape[0]
    indptr, indices, data = A.indptr, A.indices, A.data

    nat = _native.strength_keep(indptr, indices, data, theta) \
        if data.size else None
    if nat is not None:
        # native two-pass keep mask (strength.cpp) — bit-identical test
        keep, _ = nat
    else:
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        isdiag = indices == rows
        negv = -data

        # per-row max of -a_ik over off-diagonal entries (CSR segments are
        # contiguous; empty rows guarded like _row_reduce)
        maxrow = np.full(n, -np.inf)
        if negv.size:
            starts = indptr[:-1].astype(np.int64)
            seg = np.maximum.reduceat(np.where(isdiag, -np.inf, negv),
                                      np.minimum(starts, negv.size - 1))
            valid = np.diff(indptr) > 0
            maxrow[valid] = seg[valid]
        # rows with no off-diagonal entries never produce strength edges
        safe = np.where(np.isfinite(maxrow) & (maxrow != 0), maxrow, 1.0)

        s_row = negv / safe[rows]     # scaled by the row's max
        s_col = negv / safe[indices]  # transpose scaling (symmetric-A
        keep = ~isdiag & ((s_row > theta) | (s_col > theta))  # shortcut)
    cnt = np.zeros(n, dtype=np.int64)
    if keep.size:
        csum = np.concatenate([[0], np.cumsum(keep)])
        cnt = csum[indptr[1:]] - csum[indptr[:-1]]
    indptr_s = np.concatenate([[0], np.cumsum(cnt)])
    indices_s = indices[keep]
    return sp.csr_matrix(
        (np.ones(indices_s.size, dtype=np.int8), indices_s, indptr_s),
        shape=(n, n))


def aggregate_mis1(S: sp.csr_matrix):
    """Distance-1 MIS aggregation, reproducing aggregation_1_dist
    (saena_object_setup1.cpp:724-995).

    The fixpoint (see _aggregate_mis1_fixpoint) resolves to the
    lexicographically FIRST maximal independent set — a node's decision only
    depends on strictly smaller indices — so the native single-pass sweep
    (_native/mis1.cpp, O(nnz)) computes the identical aggregation without
    the O(wavefront-depth) rounds; equivalence is pinned by
    tests/test_amg.py. Falls back to the vectorized fixpoint without g++.

    Returns (agg, roots): agg[i] = coarse index of node i's aggregate,
    roots = fine indices of the root nodes (sorted).
    """
    S = S.tocsr()
    out = _native.mis1_aggregate(S.indptr, S.indices)
    if out is None:
        return _aggregate_mis1_fixpoint(S)
    agg, is_root = out
    roots = np.flatnonzero(is_root)
    coarse_id = np.searchsorted(roots, agg)
    return coarse_id.astype(np.int64), roots


def _aggregate_mis1_fixpoint(S: sp.csr_matrix):
    """Vectorized min-index propagation fixpoint — each round is exactly one
    reference while-iteration: an undecided node i looks at its
    strength-neighbors j that are undecided-or-root and takes the minimum
    index jm; if none is below i, i becomes a root; if jm is a decided root,
    i joins it; otherwise i waits for jm to decide."""
    n = S.shape[0]
    S = S.tocsr()
    indptr, indices = S.indptr, S.indices

    decided = np.zeros(n, dtype=bool)
    is_root = np.zeros(n, dtype=bool)
    agg = np.arange(n, dtype=np.int64)  # root fine-index per node

    BIG = n + 1
    counts = np.diff(indptr)
    starts = indptr[:-1]

    while True:
        und = ~decided
        if not und.any():
            break
        eligible = und | is_root
        # min eligible neighbor index per row (BIG where none); CSR entries
        # are already grouped by row, so reduceat does the row minima
        cand = np.where(eligible[indices], indices, BIG).astype(np.int64)
        jm = _row_min_indices(cand, starts, counts, n, BIG)

        has_cand = jm < np.arange(n)
        # no smaller eligible neighbor -> become a root
        new_root = und & ~has_cand
        # smaller eligible neighbor that is a decided root -> join it
        join = und & has_cand & decided[jm.clip(0, n - 1)]

        if not (new_root.any() or join.any()):
            # every undecided node waits on another undecided node; the
            # global minimum of each chain is always a new_root, so this
            # cannot happen — guard against an infinite loop regardless.
            new_root = und.copy()

        is_root[new_root] = True
        decided[new_root] = True
        agg[join] = jm[join]
        decided[join] = True

    roots = np.flatnonzero(is_root)
    # aggregate_index_update (setup1.cpp:2103): renumber roots to 0..n_c-1
    coarse_id = np.searchsorted(roots, agg)
    return coarse_id.astype(np.int64), roots


def find_aggregation(A: sp.csr_matrix, theta: float, adaptive: bool = False):
    """Strength + aggregation + adaptive-theta loop
    (find_aggregation, saena_object_setup1.cpp:257-441).

    Returns (agg, n_coarse, theta_used)."""
    agg, n_c, theta, _ = _find_aggregation_s(A, theta, adaptive)
    return agg, n_c, theta


def _find_aggregation_s(A: sp.csr_matrix, theta: float, adaptive: bool):
    """find_aggregation that also returns the strength graph actually used,
    so find_aggregation_double doesn't recompute it (one full O(nnz)
    strength pass per level saved)."""
    S = strength_graph(A, theta)
    agg, roots = aggregate_mis1(S)
    n_c = roots.size
    if adaptive:
        division = A.shape[0] / max(1, n_c)
        th = theta
        while (division < 1.5 or division > 8.0) and 0.2 <= th <= 0.95:
            th = th + 0.05 if division > 8.0 else th - 0.05
            if not (0.2 <= th <= 0.95):
                break
            S = strength_graph(A, th)
            agg, roots = aggregate_mis1(S)
            n_c = roots.size
            division = A.shape[0] / max(1, n_c)
        theta = th
    return agg, n_c, theta, S


def find_aggregation_double(A: sp.csr_matrix, theta: float,
                            adaptive: bool = False):
    """Composed (double) aggregation: run the distance-1 MIS pass, build the
    aggregate-adjacency graph, and aggregate THAT once more — AGMG-style
    pairwise-squared coarsening. The reference ships the same idea as
    aggregation_2_dist but leaves it #if 0-disabled
    (saena_object_setup1.cpp:1375); here it is a working opt-in
    (Options.aggregation="double").

    Why: min-index distance-1 aggregation degenerates to ~size-2 aggregates
    on lexicographically ordered grids (both here and in the reference's
    decision loop), which makes Galerkin level-1/2 operators carry 5-6x
    the fine grid's nnz. Composing two passes yields ~4-6x coarsening per
    level: on the 48^3 Poisson the coarse-grid nnz drops ~20x for +2-3 pCG
    iterations — a large net win on V-cycle wall time and setup cost.

    Returns (agg, n_coarse, theta_used) like find_aggregation."""
    agg1, nc1, theta_used, S1 = _find_aggregation_s(A, theta, adaptive)
    n = A.shape[0]
    T = sp.csr_matrix(
        (np.ones(n), (np.arange(n), agg1)), shape=(n, nc1))
    Sc = (T.T @ S1 @ T).tocsr()
    Sc.setdiag(0)
    Sc.eliminate_zeros()
    agg2, roots2 = aggregate_mis1(Sc)
    return agg2[agg1], roots2.size, theta_used
