"""Jitted smoothers.

Jacobi (ref saena_matrix.cpp:1044-1071) and Chebyshev (ref :1074-1131,
classic 3-term recurrence on [0.13*eig, eig] of D^{-1}A, matching homg's
coefficients so iteration counts line up). Iteration counts are static so
XLA unrolls and fuses the elementwise chains into the SpMV.
"""
from __future__ import annotations

import jax.numpy as jnp


def _update(A, dinv, u, rhs, c: float, add_x: bool = True):
    """[u +] c * dinv * (rhs - A u). Formats with a fused single-pass
    kernel (DiaMatrix on TPU) take it; others do the XLA expression,
    which XLA fuses into the matvec epilogue anyway.

    Mixed precision follows the reference (saena_object.cpp:241-285,
    vSend_f buffers): only the MATVEC runs in the operator's reduced dtype;
    the residual/update arithmetic stays in the vector dtype. Low-dtype
    vector arithmetic loses the correction signal once the residual nears
    the low dtype's epsilon and pCG stalls (SiH4 r1 regression)."""
    fu = getattr(A, "fused_update", None)
    if fu is not None and A.dtype == u.dtype:
        return fu(u, rhs, dinv=dinv, c=c, add_x=add_x)
    z = dinv * (rhs - A.matvec(u).astype(u.dtype)) * c
    return u + z if add_x else z


def jacobi(A, inv_diag, u, rhs, iters: int, omega: float = 2.0 / 3.0,
           u_is_zero: bool = False):
    """u <- u - omega D^{-1} (A u - rhs), `iters` times.
    u_is_zero (static) elides the first A@0 matvec."""
    for k in range(iters):
        if k == 0 and u_is_zero:
            u = omega * inv_diag * rhs
        else:
            u = _update(A, inv_diag, u, rhs, float(omega))
    return u


def chebyshev(A, inv_diag, eig_max: float, u, rhs, iters: int,
              u_is_zero: bool = False):
    """Chebyshev smoothing; eig_max is a static Python float of
    lambda_max(D^{-1}A) (already includes the 1.0001 safety factor).
    u_is_zero (static) elides the first A@0 matvec — the V-cycle always
    pre-smooths from a zero iterate."""
    if iters <= 0:
        return u
    alpha = 0.13 * eig_max
    beta = eig_max
    delta = (beta - alpha) / 2.0
    theta = (beta + alpha) / 2.0
    s1 = theta / delta
    rhok = 1.0 / s1

    if u_is_zero:
        d = inv_diag * rhs * (1.0 / theta)
        u = d
    else:
        d = _update(A, inv_diag, u, rhs, 1.0 / theta, add_x=False)
        u = u + d
    for _ in range(1, iters):
        rhokp1 = 1.0 / (2.0 * s1 - rhok)
        d1 = rhokp1 * rhok
        d2 = 2.0 * rhokp1 / delta
        rhok = rhokp1
        res = _update(A, inv_diag, u, rhs, float(d2), add_x=False)
        d = d1 * d + res
        u = u + d
    return u


def smooth(level, params, u, rhs, iters: int, u_is_zero: bool = False):
    """Dispatch like saena_object::smooth (saena_object.tpp:5-16). Uses the
    level's reduced-precision operator copy when one was built
    (Options.smooth_dtype) — smoother matvecs are preconditioner-internal,
    the outer Krylov always sees the exact operator."""
    if iters <= 0:
        return u
    A = getattr(level, "A_smooth", None) or level.A
    if params.smoother == "jacobi":
        return jacobi(A, level.inv_diag, u, rhs, iters,
                      params.jacobi_omega, u_is_zero=u_is_zero)
    elif params.smoother == "chebyshev":
        return chebyshev(A, level.inv_diag, level.eig_max, u, rhs,
                         iters, u_is_zero=u_is_zero)
    raise ValueError(f"unknown smoother {params.smoother!r}")
