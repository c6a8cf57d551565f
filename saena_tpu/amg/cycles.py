"""The V-cycle (jitted), mirroring saena_object::vcycle (solve.cpp:961-1431).

Level recursion is unrolled in Python (the level count is static), so XLA
sees one straight-line program per hierarchy: smooth -> residual -> restrict
-> recurse -> prolong-correct -> smooth, with the coarsest level hitting the
cached dense LU (SuperLU replacement) or matvec-only CG.

Sign convention follows the reference: res = A u - rhs is restricted, and the
coarse correction is SUBTRACTED (u -= P e), see solve.cpp:1240-1247.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from saena_tpu.amg.smoothers import smooth
from saena_tpu.amg.hierarchy import Hierarchy, SolveParams


def _dot(x, y):
    return jnp.vdot(x, y)


def coarsest_cg(A, u, rhs, max_iter: int, tol: float):
    """Matvec-only CG for the coarsest level (ref solve_coarsest_CG,
    solve.cpp:14-114): iterate until ||r|| < tol * ||r0|| or max_iter."""
    r = rhs - A.matvec(u).astype(rhs.dtype)
    rr0 = _dot(r, r)
    thr = rr0 * tol * tol

    def cond(c):
        i, u, r, p, rr = c
        return (i < max_iter) & (rr > thr)

    def body(c):
        i, u, r, p, rr = c
        h = A.matvec(p).astype(rhs.dtype)
        alpha = rr / _dot(p, h)
        u = u + alpha * p
        r = r - alpha * h
        rr_new = _dot(r, r)
        beta = rr_new / rr
        p = r + beta * p
        return i + 1, u, r, p, rr_new

    _, u, _, _, _ = jax.lax.while_loop(cond, body, (0, u, r, r, rr0))
    return u


def coarsest_solve(hierarchy: Hierarchy, params: SolveParams, rhs):
    level = hierarchy.levels[-1]
    if params.direct_solver == "LU" and hierarchy.coarse_lu is not None:
        return hierarchy.coarse_lu.solve(rhs).astype(rhs.dtype)
    u0 = jnp.zeros_like(rhs)
    return coarsest_cg(level.A, u0, rhs,
                       params.CG_coarsest_max_iter, params.CG_coarsest_tol)


def vcycle(hierarchy: Hierarchy, params: SolveParams, u, rhs, lvl: int = 0,
           u_is_zero: bool = True):
    """One V-cycle at level ``lvl`` starting from iterate ``u``. The solver
    and every recursive call pass a zero iterate, so the pre-smoother's
    first A@0 matvec is elided (u_is_zero static); pass False when calling
    with a nonzero u (the stationary solver)."""
    levels = hierarchy.levels
    level = levels[lvl]

    if lvl == len(levels) - 1:
        return coarsest_solve(hierarchy, params, rhs)

    # 1. pre-smooth
    u = smooth(level, params, u, rhs, params.preSmooth, u_is_zero=u_is_zero)
    # 2. residual (reference sign: res = A u - rhs); fused single-pass
    # kernel where the format has one (DiaMatrix on TPU). Vectors stay in
    # u's dtype — reduced-precision levels only reduce the MATVEC (ref
    # float_level semantics, saena_object.cpp:241-285). The V-cycle's own
    # residual may ride the reduced smoother operator (preconditioner-
    # internal, like the lossy halos)
    A_res = getattr(level, "A_smooth", None) or level.A
    fu = getattr(A_res, "fused_update", None)
    if fu is not None and A_res.dtype == u.dtype:
        res = fu(u, rhs, c=-1.0, add_x=False)
    else:
        res = A_res.matvec(u).astype(u.dtype) - rhs
    # 3. restrict
    res_c = level.R.matvec(res).astype(u.dtype)
    # 4. recurse from a zero coarse iterate
    e_c = vcycle(hierarchy, params, jnp.zeros_like(res_c), res_c, lvl + 1)
    # 5. prolong + correct (subtract: res had flipped sign)
    u = u - level.P.matvec(e_c).astype(u.dtype)
    # 6. post-smooth
    u = smooth(level, params, u, rhs, params.postSmooth)
    return u
