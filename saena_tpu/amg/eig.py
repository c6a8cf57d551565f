"""Largest-eigenvalue estimation for the Chebyshev smoother.

lambda_max(D^{-1} A) with the reference's 1.0001 safety factor (ref
find_eig_lamlan, lamlan_saena.h:13-79 — MPI-aware lambda_lanczos).
Host path uses Lanczos on the similar symmetric form D^{-1/2} A D^{-1/2};
the device path is a matvec-only power iteration usable under jit/shard_map.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

SAFETY = 1.0001


def eig_max_invdiag_host(A: sp.csr_matrix) -> float:
    """lambda_max(D^{-1} A) via the symmetric similar matrix."""
    n = A.shape[0]
    d = A.diagonal()
    d_safe = np.where(d == 0, 1.0, d)
    dinv_sqrt = 1.0 / np.sqrt(np.abs(d_safe))
    # S = diag(ds) A diag(ds) by direct data scaling — the same per-entry
    # products (ds_i * a_ij) * ds_j the two sparse diag matmuls compute,
    # without materializing two intermediate CSRs
    A = A.tocsr()
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    S = sp.csr_matrix(
        ((dinv_sqrt[rows] * A.data) * dinv_sqrt[A.indices],
         A.indices, A.indptr), shape=A.shape)
    S.has_sorted_indices = A.has_sorted_indices
    # sign of diagonal is folded back: for SPD systems d > 0
    if n <= 512:
        w = np.linalg.eigvalsh(np.asarray(S.todense()))
        lam = float(w[-1])
    elif n <= 6144:
        # hard matrices (SiH4) are hypersensitive to the Chebyshev
        # endpoint — a +1.6e-4 lambda error costs +40% pCG iterations —
        # and their mid-size levels afford the O(m^2 n) reorthogonalized
        # sweep that delivers ~1e-6 accuracy (the BLAS-2 sweep is ~1 s at
        # n=6k and unacceptable at n~12k, hence the gate)
        lam = _lanczos_reorth_host(S)
    else:
        lam = _lanczos_host(S)
    return lam * SAFETY


def _top_ritz_tridiag(alphas, betas, beta_last: float):
    """(top Ritz value, residual bound) of the Lanczos tridiagonal via the
    LAPACK tridiagonal path — O(m) storage, selected-eigenpair cost, vs the
    O(m^3) full eigh on a materialized T (the per-check eigh was ~45% of
    host Lanczos time at setup; same math, so the returned values agree to
    roundoff)."""
    import scipy.linalg as sla

    k = len(alphas)
    if k == 1:
        return float(alphas[0]), abs(beta_last)
    try:
        w, v = sla.eigh_tridiagonal(
            np.asarray(alphas), np.asarray(betas[: k - 1]),
            select="i", select_range=(k - 1, k - 1))
        return float(w[0]), float(abs(beta_last * v[-1, 0]))
    except Exception:
        T = (np.diag(alphas) + np.diag(betas[: k - 1], 1)
             + np.diag(betas[: k - 1], -1))
        evals, evecs = np.linalg.eigh(T)
        return float(evals[-1]), float(abs(beta_last * evecs[-1, -1]))


def _lanczos_reorth_host(S, m: int = 40, blocks: int = 6,
                         rtol: float = 1e-7) -> float:
    """Lanczos with full reorthogonalization for mid-size levels: the
    residual bound keeps decaying past orthogonality loss, so the returned
    ritz + bound is within ~rtol of lambda_max — what Chebyshev needs on
    endpoint-sensitive matrices. O(m^2 n); gated to n <= 6144 by the
    caller."""
    n = S.shape[0]
    mv = _host_matvec(S)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(n)
    v /= np.linalg.norm(v)
    V = np.empty((blocks * m + 1, n))
    V[0] = v
    alphas, betas = [], []
    j = 0
    ritz = bound = 0.0
    for blk in range(blocks):
        for _ in range(m):
            w = mv(V[j])
            a = float(V[j] @ w)
            alphas.append(a)
            w -= a * V[j]
            if j > 0:
                w -= betas[-1] * V[j - 1]
            w -= V[: j + 1].T @ (V[: j + 1] @ w)   # full reorth
            b = float(np.linalg.norm(w))
            if b <= 64 * np.finfo(np.float64).eps * max(
                    1.0, max(abs(x) for x in alphas)):
                T = np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
                return float(np.linalg.eigvalsh(T)[-1])
            betas.append(b)
            V[j + 1] = w / b
            j += 1
        # full eigh, NOT the tridiagonal driver: endpoint-sensitive
        # matrices (SiH4) flip pinned iteration counts on a 1-ulp lambda
        # change, and this path exists precisely for them — it runs once
        # per 40-step block, so the O(m^3) cost is negligible here
        T = np.diag(alphas) + np.diag(betas[:-1], 1) + np.diag(betas[:-1], -1)
        evals, evecs = np.linalg.eigh(T)
        ritz = float(evals[-1])
        bound = abs(betas[-1] * evecs[-1, -1])
        if bound <= rtol * abs(ritz):
            return ritz + bound
    return ritz + bound


def _host_matvec(S):
    """S @ x closure: the native OpenMP CSR SpMV when available (scipy-
    identical per-row sequential accumulation, strength.cpp — bitwise-same
    Lanczos iterates), scipy otherwise. Arrays are pre-converted once so
    the per-iteration call is allocation-free aside from the output."""
    from saena_tpu import _native

    if not _native.have_native():
        return lambda x: S @ x
    S = S.tocsr()
    indptr = np.ascontiguousarray(S.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(S.indices, dtype=np.int32)
    data = np.ascontiguousarray(S.data, dtype=np.float64)
    return lambda x: _native.csr_matvec(indptr, indices, data, x)


def _lanczos_host(S, m: int = 96, rtol: float = 1e-6) -> float:
    """Plain 3-term Lanczos (no reorthogonalization) for the extreme Ritz
    value (the reference runs lambda_lanczos, lamlan_saena.h:13-79, which is
    also a plain recurrence). For a lambda_max ESTIMATE the orthogonality
    loss that plagues interior eigenvalues is harmless: ghosts duplicate
    already-converged extreme Ritz values, leaving the maximum unchanged
    (Paige), so the O(m^2 n) reorthogonalization sweep — 200+ s at n ~ 1e5
    with ARPACK-grade tolerances — buys nothing here.

    Returns ritz + residual bound so the Chebyshev interval sits at or above
    lambda_max. Cost: <= m SpMVs + O(m n)."""
    n = S.shape[0]
    mv = _host_matvec(S)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(n)
    v /= np.linalg.norm(v)
    v_prev = np.zeros(n)
    beta_prev = 0.0
    alphas: list[float] = []
    betas: list[float] = []
    ritz_prev = -np.inf
    ritz = bound = 0.0
    max_abs_alpha = 1.0

    def _top_ritz():
        return _top_ritz_tridiag(alphas, betas, beta_prev)

    for j in range(m):
        w = mv(v) - beta_prev * v_prev
        a = float(v @ w)
        alphas.append(a)
        max_abs_alpha = max(max_abs_alpha, abs(a))
        w -= a * v
        b = float(np.linalg.norm(w))
        # relative breakdown test: Krylov exhaustion leaves a roundoff-size
        # b; dividing by it amplifies noise into T (ADVICE r1)
        if b <= 64 * np.finfo(np.float64).eps * max_abs_alpha:
            beta_prev = 0.0
            ritz, bound = _top_ritz()
            return ritz
        v_prev, v = v, w / b
        beta_prev = b
        if (j + 1) % 4 == 0 or j == m - 1:
            ritz, bound = _top_ritz()
            # converged when the residual bound is small or the max Ritz
            # value has stagnated (bound shrinks slowly on clustered tops,
            # where a modest overestimate is harmless — large fine levels
            # take this path; endpoint-sensitive matrices are mid-size and
            # get _lanczos_reorth_host's tight bound instead)
            if bound <= 1e-4 * abs(ritz) or \
                    abs(ritz - ritz_prev) <= rtol * abs(ritz):
                return ritz + min(bound, 1e-3 * abs(ritz))
            ritz_prev = ritz
        betas.append(b)
    return ritz + min(bound, 1e-3 * abs(ritz))


def _power_iteration_host(S, iters: int = 100, tol: float = 1e-5) -> float:
    rng = np.random.default_rng(0)
    v = rng.standard_normal(S.shape[0])
    v /= np.linalg.norm(v)
    lam = 0.0
    for _ in range(iters):
        w = S @ v
        lam_new = float(v @ w)
        nw = np.linalg.norm(w)
        if nw == 0:
            return 0.0
        v = w / nw
        if abs(lam_new - lam) < tol * abs(lam_new):
            lam = lam_new
            break
        lam = lam_new
    return lam


def eig_max_invdiag_device(matvec, inv_diag, n_pad: int, dtype, iters: int = 60, seed: int = 0):
    """Power iteration for lambda_max(D^{-1}A) with only a matvec closure —
    works under jit and over a sharded mesh (dots become psums inside
    shard_map). Returns a traced scalar."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    v = jax.random.normal(key, (n_pad,), dtype=dtype)

    def body(_, v):
        w = inv_diag * matvec(v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = inv_diag * matvec(v)
    lam = jnp.vdot(v, w) / jnp.vdot(v, v)
    return lam * SAFETY
