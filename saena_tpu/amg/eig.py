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
    S = sp.diags(dinv_sqrt) @ A @ sp.diags(dinv_sqrt)
    # sign of diagonal is folded back: for SPD systems d > 0
    if n <= 512:
        w = np.linalg.eigvalsh(np.asarray(S.todense()))
        lam = float(w[-1])
    else:
        lam = _lanczos_host(S)
    return lam * SAFETY


def _lanczos_host(S, m: int = 40, blocks: int = 8, rtol: float = 1e-7) -> float:
    """Hand-rolled Lanczos with full reorthogonalization (the reference runs
    lambda_lanczos, lamlan_saena.h:13-79). ARPACK's eigsh is ~8x slower here
    for the same answer (restart machinery we don't need for one extreme
    Ritz value). The returned value is ritz + residual bound so the
    Chebyshev interval never underestimates lambda_max.

    rtol is deliberately tight (1e-7): the Chebyshev interval endpoints are
    surprisingly sensitive on hard matrices — on SiH4 (scaled) a 1e-3-loose
    estimate at one mid level stalls pCG at rel_res 1.5e-6 while the exact
    value converges at 1e-8 in 142 iterations (round-1 ADVICE finding)."""
    n = S.shape[0]
    rng = np.random.default_rng(0)
    v = rng.standard_normal(n)
    v /= np.linalg.norm(v)
    V = np.empty((blocks * m + 1, n))
    V[0] = v
    alphas, betas = [], []
    j = 0
    for blk in range(blocks):
        for _ in range(m):
            w = S @ V[j]
            a = float(V[j] @ w)
            alphas.append(a)
            w -= a * V[j]
            if j > 0:
                w -= betas[-1] * V[j - 1]
            # full reorthogonalization (twice is enough)
            w -= V[: j + 1].T @ (V[: j + 1] @ w)
            b = float(np.linalg.norm(w))
            # relative breakdown test: Krylov exhaustion leaves a roundoff-
            # size b; dividing by it amplifies noise into T (ADVICE r1)
            if b <= 64 * np.finfo(np.float64).eps * max(
                    1.0, max(abs(a) for a in alphas)):
                T = np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
                return float(np.linalg.eigvalsh(T)[-1])
            betas.append(b)
            V[j + 1] = w / b
            j += 1
        T = np.diag(alphas) + np.diag(betas[:-1], 1) + np.diag(betas[:-1], -1)
        evals, evecs = np.linalg.eigh(T)
        ritz = float(evals[-1])
        bound = abs(betas[-1] * evecs[-1, -1])
        if bound <= rtol * abs(ritz):
            return ritz + bound
    # not converged to rtol within blocks*m steps: ritz underestimates
    # lambda_max, which Chebyshev must never see — fall back to ARPACK
    lam = float(spla.eigsh(S, k=1, which="LA",
                           return_eigenvectors=False, tol=1e-10)[0])
    return max(lam, ritz + bound)


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
