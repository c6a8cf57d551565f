"""Outer solvers: pCG (jitted, the hot path), stationary V-cycle iteration,
plain CG, smoother-only, and restarted FGMRES.

solve_pCG mirrors saena_object::solve_pCG (solve.cpp:2389-2803): CG
preconditioned by one V-cycle per iteration, residual convention
r = A u - rhs, update u -= alpha p, stop when ||r||^2 < ||r0||^2 * tol^2.
The loop runs on device inside lax.while_loop; one dispatch per solve.

The reference declares GMRES/pGMRES but ships them disabled
(solve.cpp:3805, :4074 are `#if 0`); here solve_GMRES is a working
right-preconditioned restarted FGMRES.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from saena_tpu.amg.hierarchy import Hierarchy, SolveParams
from saena_tpu.amg.cycles import vcycle
from saena_tpu.amg.smoothers import smooth


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveResult:
    u: jax.Array
    iters: jax.Array            # iterations performed
    init_res: jax.Array         # ||r0||
    final_res: jax.Array        # ||r_final|| (solver-internal residual)
    history: jax.Array          # ||r_i||, padded with NaN past `iters`
    true_res: jax.Array         # ||A u - rhs|| recomputed at exit

    @property
    def rel_res(self):
        return self.final_res / self.init_res


def _dot(x, y):
    return jnp.vdot(x, y)


def _finalize(u, hierarchy):
    """Undo symmetric scaling on the way out (ref scale_vector after solve)."""
    if hierarchy.inv_sq_diag is not None:
        u = u * hierarchy.inv_sq_diag.astype(u.dtype)
    return u


def _prep_rhs(rhs, hierarchy):
    if hierarchy.inv_sq_diag is not None:
        rhs = rhs * hierarchy.inv_sq_diag.astype(rhs.dtype)
    return rhs


@partial(jax.jit, static_argnames=("params", "max_iter"))
def _pcg(hierarchy: Hierarchy, params: SolveParams, rhs, tol, max_iter: int):
    A = hierarchy.levels[0].A
    u = jnp.zeros_like(rhs)
    r = A.matvec(u) - rhs                         # = -rhs
    init_dot = _dot(r, r)
    thr = init_dot * tol * tol
    hist = jnp.full(max_iter + 1, jnp.nan, dtype=rhs.dtype)
    hist = hist.at[0].set(jnp.sqrt(init_dot))

    rho = vcycle(hierarchy, params, jnp.zeros_like(r), r)
    p = rho

    def cond(c):
        i, u, r, rho, p, rr, hist = c
        return (i < max_iter) & (rr >= thr)

    def body(c):
        i, u, r, rho, p, rr, hist = c
        h = A.matvec(p)
        rho_res = _dot(r, rho)
        pdoth = _dot(p, h)
        alpha = rho_res / pdoth
        u = u - alpha * p
        r = r - alpha * h
        replaced = jnp.asarray(False)
        if params.residual_replace > 0:
            # periodic residual replacement: bound low-precision drift of
            # the recursive residual from the true b - A u. The direction
            # restarts (beta = 0) on replacement iterations — carrying beta
            # against a replaced residual destroys conjugacy.
            replaced = (i + 1) % params.residual_replace == 0
            r = jax.lax.cond(replaced,
                             lambda _: A.matvec(u) - rhs,
                             lambda _: r, None)
        rr_new = _dot(r, r)
        hist = hist.at[i + 1].set(jnp.sqrt(rr_new))

        def cont(_):
            rho2 = vcycle(hierarchy, params, jnp.zeros_like(r), r)
            beta = jnp.where(replaced, 0.0, _dot(r, rho2) / rho_res)
            return rho2, rho2 + beta * p

        rho, p = jax.lax.cond(rr_new >= thr, cont, lambda _: (rho, p), None)
        return i + 1, u, r, rho, p, rr_new, hist

    i, u, r, rho, p, rr, hist = jax.lax.while_loop(
        cond, body, (0, u, r, rho, p, init_dot, hist)
    )
    true_res = jnp.linalg.norm(A.matvec(u) - rhs)
    return SolveResult(
        u=u, iters=i, init_res=jnp.sqrt(init_dot),
        final_res=jnp.sqrt(rr), history=hist, true_res=true_res,
    )


def solve_pCG(hierarchy, rhs, params=None, tol: float = 1e-8,
              max_iter: int = 100) -> SolveResult:
    params = params or SolveParams()
    rhs = _prep_rhs(jnp.asarray(rhs, dtype=hierarchy.dtype), hierarchy)
    res = _pcg(hierarchy, params, rhs, jnp.asarray(tol, hierarchy.dtype), max_iter)
    return dataclasses.replace(res, u=_finalize(res.u, hierarchy))


@partial(jax.jit, static_argnames=("params", "max_iter"))
def _vcycle_iter(hierarchy, params, rhs, tol, max_iter: int):
    """Stationary iteration: u <- vcycle(u) until converged
    (ref saena_object::solve, solve.cpp:1883-2016)."""
    A = hierarchy.levels[0].A
    u = jnp.zeros_like(rhs)
    r0 = A.matvec(u) - rhs
    init_dot = _dot(r0, r0)
    thr = init_dot * tol * tol
    hist = jnp.full(max_iter + 1, jnp.nan, dtype=rhs.dtype)
    hist = hist.at[0].set(jnp.sqrt(init_dot))

    def cond(c):
        i, u, rr, hist = c
        return (i < max_iter) & (rr >= thr)

    def body(c):
        i, u, rr, hist = c
        u = vcycle(hierarchy, params, u, rhs, u_is_zero=False)
        r = A.matvec(u) - rhs
        rr = _dot(r, r)
        hist = hist.at[i + 1].set(jnp.sqrt(rr))
        return i + 1, u, rr, hist

    i, u, rr, hist = jax.lax.while_loop(cond, body, (0, u, init_dot, hist))
    return SolveResult(u=u, iters=i, init_res=jnp.sqrt(init_dot),
                       final_res=jnp.sqrt(rr), history=hist,
                       true_res=jnp.sqrt(rr))


def solve(hierarchy, rhs, params=None, tol: float = 1e-8,
          max_iter: int = 100) -> SolveResult:
    params = params or SolveParams()
    rhs = _prep_rhs(jnp.asarray(rhs, dtype=hierarchy.dtype), hierarchy)
    res = _vcycle_iter(hierarchy, params, rhs, jnp.asarray(tol, hierarchy.dtype), max_iter)
    return dataclasses.replace(res, u=_finalize(res.u, hierarchy))


@partial(jax.jit, static_argnames=("params", "max_iter"))
def _smoother_iter(hierarchy, params, rhs, tol, max_iter: int):
    """Smoother-only solve (ref solve_smoother, solve.cpp:2017)."""
    A = hierarchy.levels[0].A
    lv = hierarchy.levels[0]
    u = jnp.zeros_like(rhs)
    r0 = A.matvec(u) - rhs
    init_dot = _dot(r0, r0)
    thr = init_dot * tol * tol
    hist = jnp.full(max_iter + 1, jnp.nan, dtype=rhs.dtype)
    hist = hist.at[0].set(jnp.sqrt(init_dot))

    def cond(c):
        i, u, rr, hist = c
        return (i < max_iter) & (rr >= thr)

    def body(c):
        i, u, rr, hist = c
        u = smooth(lv, params, u, rhs, 1)
        r = A.matvec(u) - rhs
        rr = _dot(r, r)
        hist = hist.at[i + 1].set(jnp.sqrt(rr))
        return i + 1, u, rr, hist

    i, u, rr, hist = jax.lax.while_loop(cond, body, (0, u, init_dot, hist))
    return SolveResult(u=u, iters=i, init_res=jnp.sqrt(init_dot),
                       final_res=jnp.sqrt(rr), history=hist,
                       true_res=jnp.sqrt(rr))


def solve_smoother(hierarchy, rhs, params=None, tol: float = 1e-8,
                   max_iter: int = 100) -> SolveResult:
    params = params or SolveParams()
    rhs = _prep_rhs(jnp.asarray(rhs, dtype=hierarchy.dtype), hierarchy)
    res = _smoother_iter(hierarchy, params, rhs, jnp.asarray(tol, hierarchy.dtype), max_iter)
    return dataclasses.replace(res, u=_finalize(res.u, hierarchy))


@partial(jax.jit, static_argnames=("max_iter",))
def _cg(A, rhs, tol, max_iter: int):
    """Unpreconditioned CG (ref solve_CG, solve.cpp:2119)."""
    u = jnp.zeros_like(rhs)
    r = rhs - A.matvec(u)
    init_dot = _dot(r, r)
    thr = init_dot * tol * tol
    hist = jnp.full(max_iter + 1, jnp.nan, dtype=rhs.dtype)
    hist = hist.at[0].set(jnp.sqrt(init_dot))

    def cond(c):
        i, u, r, p, rr, hist = c
        return (i < max_iter) & (rr >= thr)

    def body(c):
        i, u, r, p, rr, hist = c
        h = A.matvec(p)
        alpha = rr / _dot(p, h)
        u = u + alpha * p
        r = r - alpha * h
        rr_new = _dot(r, r)
        beta = rr_new / rr
        p = r + beta * p
        hist = hist.at[i + 1].set(jnp.sqrt(rr_new))
        return i + 1, u, r, p, rr_new, hist

    i, u, r, p, rr, hist = jax.lax.while_loop(
        cond, body, (0, u, r, r, init_dot, hist))
    true_res = jnp.linalg.norm(rhs - A.matvec(u))
    return SolveResult(u=u, iters=i, init_res=jnp.sqrt(init_dot),
                       final_res=jnp.sqrt(rr), history=hist,
                       true_res=true_res)


def solve_CG(hierarchy, rhs, params=None, tol: float = 1e-8,
             max_iter: int = 100) -> SolveResult:
    rhs = _prep_rhs(jnp.asarray(rhs, dtype=hierarchy.dtype), hierarchy)
    res = _cg(hierarchy.levels[0].A, rhs, jnp.asarray(tol, hierarchy.dtype), max_iter)
    return dataclasses.replace(res, u=_finalize(res.u, hierarchy))


@partial(jax.jit, static_argnames=("params", "max_iter", "restart",
                                   "precondition"))
def _gmres_device(hierarchy: Hierarchy, params: SolveParams, rhs, tol,
                  max_iter: int, restart: int, precondition: bool):
    """Fully-jitted restarted FGMRES (right-preconditioned by one V-cycle):
    the Arnoldi loop, modified Gram-Schmidt, Givens rotations, and the
    triangular solve all run on device inside lax.while_loops — ONE
    dispatch per solve, like _pcg. On the tunneled TPU the host-driven
    variant paid a ~26 ms value-fetch RPC per Arnoldi step (VERDICT r3);
    this runs the same recurrence with zero mid-solve fetches.

    Masked-loop trick: MGS and the Givens sweep run a fixed 0..m loop with
    updates masked by j <= k; inactive steps subtract 0*V[j], which is an
    exact no-op, so the arithmetic matches the host loop at the carried
    precision. The small H/g/cs/sn systems are carried at >= f32.
    """
    A = hierarchy.levels[0].A
    n = rhs.shape[0]
    dtype = rhs.dtype
    hdt = jnp.promote_types(dtype, jnp.float32)   # H/givens precision
    m = restart
    tiny = jnp.asarray(np.finfo(np.dtype(hdt)).tiny, hdt)

    def M(v):
        if precondition:
            return vcycle(hierarchy, params, jnp.zeros_like(v), v)
        return v

    u0 = jnp.zeros_like(rhs)
    r0 = rhs - A.matvec(u0)
    init_res = jnp.linalg.norm(r0).astype(hdt)
    thr = init_res * jnp.asarray(tol, hdt)
    hist0 = jnp.full(max_iter + 1, jnp.nan, dtype=hdt)
    hist0 = hist0.at[0].set(init_res)

    def restart_cond(c):
        u, r, res_norm, total_it, hist = c
        return (res_norm >= thr) & (total_it < max_iter)

    def restart_body(c):
        u, r, res_norm, total_it, hist = c
        V = jnp.zeros((m + 1, n), dtype=dtype)
        Z = jnp.zeros((m, n), dtype=dtype)
        H = jnp.zeros((m + 1, m), dtype=hdt)
        g = jnp.zeros(m + 1, dtype=hdt).at[0].set(res_norm)
        cs = jnp.zeros(m, dtype=hdt)
        sn = jnp.zeros(m, dtype=hdt)
        V = V.at[0].set((r / res_norm.astype(dtype)))

        def arn_cond(a):
            k, V, Z, H, g, cs, sn, rn, it, hist, brk = a
            return (k < m) & (it < max_iter) & (rn >= thr) & ~brk

        def arn_body(a):
            k, V, Z, H, g, cs, sn, rn, it, hist, brk = a
            z = M(V[k])
            w = A.matvec(z).astype(hdt)
            Z = Z.at[k].set(z)

            def mgs(j, wh):
                w, Hcol = wh
                hjk = jnp.where(j <= k, jnp.vdot(V[j].astype(hdt), w), 0.0)
                return w - hjk * V[j].astype(hdt), Hcol.at[j].set(hjk)

            w, Hcol = jax.lax.fori_loop(
                0, m + 1, mgs, (w, jnp.zeros(m + 1, dtype=hdt)))
            h_next = jnp.linalg.norm(w)
            Hcol = Hcol.at[k + 1].set(h_next)
            V = V.at[k + 1].set(
                jnp.where(h_next > tiny, (w / jnp.where(h_next > tiny,
                                                        h_next, 1.0)),
                          0.0).astype(dtype))

            def giv(j, Hc):
                t = cs[j] * Hc[j] + sn[j] * Hc[j + 1]
                t2 = -sn[j] * Hc[j] + cs[j] * Hc[j + 1]
                return Hc.at[j].set(jnp.where(j < k, t, Hc[j])) \
                         .at[j + 1].set(jnp.where(j < k, t2, Hc[j + 1]))

            Hcol = jax.lax.fori_loop(0, m, giv, Hcol)
            d = jnp.hypot(Hcol[k], Hcol[k + 1])
            # total breakdown (Hcol[k]==h_next==0: w exactly in span(V)
            # with no diagonal left): a 0/0 rotation would poison H/g with
            # NaN (ADVICE r4). Mask to the identity rotation, give column
            # k a unit diagonal and a ZERO rhs so the padded triangular
            # solve returns y[k] = 0 exactly, and fold into brk — the
            # restart loop then recomputes the true residual and carries on.
            dz = d <= tiny
            d_safe = jnp.where(dz, 1.0, d)
            ck = jnp.where(dz, 1.0, Hcol[k] / d_safe)
            sk = jnp.where(dz, 0.0, Hcol[k + 1] / d_safe)
            cs = cs.at[k].set(ck)
            sn = sn.at[k].set(sk)
            Hcol = Hcol.at[k].set(d_safe).at[k + 1].set(0.0)
            H = H.at[:, k].set(Hcol[:m + 1])
            g = g.at[k + 1].set(-sk * g[k]) \
                 .at[k].set(jnp.where(dz, 0.0, ck * g[k]))
            rn_new = jnp.abs(g[k + 1])
            hist = hist.at[it + 1].set(rn_new)
            return (k + 1, V, Z, H, g, cs, sn, rn_new, it + 1, hist,
                    (h_next <= tiny) | dz)

        k, V, Z, H, g, cs, sn, rn, it, hist, brk = jax.lax.while_loop(
            arn_cond, arn_body,
            (0, V, Z, H, g, cs, sn, res_norm, total_it, hist,
             jnp.asarray(False)))

        # y = H[:k,:k]^{-1} g[:k] — H is upper triangular after the
        # rotations; rows past k get a unit diagonal and zero rhs so the
        # padded m x m triangular solve returns y[j>=k] = 0 exactly
        active = jnp.arange(m) < k
        eye = jnp.eye(m, dtype=bool)
        Hm = H[:m, :m] * active[None, :]
        Hm = jnp.where(eye & ~active[None, :], 1.0, Hm)
        gm = jnp.where(active, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Hm, gm, lower=False)
        du = (y.astype(dtype) @ Z)
        u = u + du
        r = rhs - A.matvec(u)
        res_true = jnp.linalg.norm(r).astype(hdt)
        # the host path overwrites the last Givens estimate with the true
        # restart-boundary residual; mirror it (index it, already written)
        hist = hist.at[it].set(res_true)
        return u, r, res_true, it, hist

    u, r, res_norm, total_it, hist = jax.lax.while_loop(
        restart_cond, restart_body, (u0, r0, init_res, 0, hist0))
    return SolveResult(
        u=u, iters=total_it, init_res=init_res.astype(dtype),
        final_res=res_norm.astype(dtype), history=hist.astype(dtype),
        true_res=res_norm.astype(dtype))


def solve_GMRES(hierarchy, rhs, params=None, tol: float = 1e-8,
                max_iter: int = 100, restart: int = 30,
                precondition: bool = True,
                engine: str = "device") -> SolveResult:
    """Restarted FGMRES, right-preconditioned by one V-cycle when
    ``precondition`` (pGMRES). ``engine="device"`` (default) runs the
    fully-jitted Arnoldi (_gmres_device); ``engine="host"`` keeps the
    original host-driven loop (reference-style, used as the parity
    oracle in tests)."""
    params = params or SolveParams()
    if engine == "device":
        rhs_d = _prep_rhs(jnp.asarray(rhs, dtype=hierarchy.dtype), hierarchy)
        res = _gmres_device(hierarchy, params, rhs_d,
                            jnp.asarray(tol, hierarchy.dtype),
                            max_iter, restart, precondition)
        return dataclasses.replace(res, u=_finalize(res.u, hierarchy))
    rhs = _prep_rhs(jnp.asarray(rhs, dtype=hierarchy.dtype), hierarchy)
    A = hierarchy.levels[0].A
    n = rhs.shape[0]
    dtype = rhs.dtype

    u = jnp.zeros_like(rhs)

    def M(v):
        if precondition:
            # from a zero iterate one V-cycle is a linear map approximating
            # A^{-1} v (coarsest level solves exactly, smoothers contract).
            return vcycle(hierarchy, params, jnp.zeros_like(v), v)
        return v

    r = rhs - A.matvec(u)
    init_res = float(jnp.linalg.norm(r))
    res_norm = init_res
    hist = [init_res]
    total_it = 0

    while res_norm >= tol * init_res and total_it < max_iter:
        m = min(restart, max_iter - total_it)
        V = np.zeros((m + 1, n), dtype=dtype)
        Z = np.zeros((m, n), dtype=dtype)
        H = np.zeros((m + 1, m))
        beta = res_norm
        V[0] = np.asarray(r / res_norm)
        g = np.zeros(m + 1)
        g[0] = beta
        cs, sn = np.zeros(m), np.zeros(m)
        k_used = 0
        for k in range(m):
            z = M(jnp.asarray(V[k]))
            w = A.matvec(z)
            Z[k] = np.asarray(z)
            wn = np.asarray(w, dtype=np.float64)
            for j in range(k + 1):   # modified Gram-Schmidt
                H[j, k] = float(np.dot(V[j], wn))
                wn = wn - H[j, k] * V[j]
            h_next = float(np.linalg.norm(wn))
            H[k + 1, k] = h_next
            if h_next > 1e-300:
                V[k + 1] = (wn / h_next).astype(dtype)
            # Givens rotations (ref GMRES_update helpers, solve.cpp:3745-3803)
            for j in range(k):
                t = cs[j] * H[j, k] + sn[j] * H[j + 1, k]
                H[j + 1, k] = -sn[j] * H[j, k] + cs[j] * H[j + 1, k]
                H[j, k] = t
            d = np.hypot(H[k, k], H[k + 1, k])
            cs[k], sn[k] = H[k, k] / d, H[k + 1, k] / d
            H[k, k] = d
            H[k + 1, k] = 0.0
            g[k + 1] = -sn[k] * g[k]
            g[k] = cs[k] * g[k]
            k_used = k + 1
            total_it += 1
            res_norm = abs(g[k + 1])
            hist.append(res_norm)
            if res_norm < tol * init_res or h_next <= 1e-300:
                break
        y = np.linalg.solve(H[:k_used, :k_used], g[:k_used])
        du = (Z[:k_used].T @ y).astype(dtype)
        u = u + jnp.asarray(du)
        r = rhs - A.matvec(u)
        res_norm = float(jnp.linalg.norm(r))
        hist[-1] = res_norm

    hist_arr = jnp.full(max_iter + 1, jnp.nan, dtype=dtype)
    hist_arr = hist_arr.at[: len(hist)].set(jnp.asarray(hist[: max_iter + 1], dtype=dtype))
    return SolveResult(
        u=_finalize(u, hierarchy),
        iters=jnp.asarray(total_it),
        init_res=jnp.asarray(init_res, dtype=dtype),
        final_res=jnp.asarray(res_norm, dtype=dtype),
        history=hist_arr,
        true_res=jnp.asarray(res_norm, dtype=dtype),
    )
