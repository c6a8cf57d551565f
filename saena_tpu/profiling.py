"""Profiling surfaces mirroring the reference's instrumentation:

- profile_matvecs: per-level SpMV timing (ref saena_object.cpp:618-697)
- vcycle_breakdown: Rtransfer/Ptransfer/smooth/coarsest/resid components
  (ref print_vcycle_time, saena_object.cpp:593-615; PROFILE_VCYCLE
  accumulators saena_object.h:432-445)
- solve_profile: pCG phase split matvec/vcycle/dots
  (ref solve_pCG_profile, solve.cpp:2804-3597)

Each phase is jitted separately so wall timings isolate the stage; the same
metric names are kept so reports diff against the reference's output.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from saena_tpu.amg.cycles import coarsest_solve, vcycle
from saena_tpu.amg.smoothers import smooth


def _time(fn, *args, n_warm=3, n_iter=20):
    for _ in range(n_warm):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def profile_matvecs(hierarchy, n_iter: int = 20) -> list[dict]:
    """Per-level matvec wall time + nnz/s (ref profile_matvecs)."""
    rows = []
    for lv in hierarchy.levels:
        x = jnp.ones(lv.n_pad, dtype=lv.dtype)
        f = jax.jit(lambda v, A=lv.A: A.matvec(v))
        dt = _time(f, x, n_iter=n_iter)
        rows.append({
            "level": lv.lvl,
            "n": lv.n,
            "nnz": lv.A.nnz,
            "format": type(lv.A).__name__,
            "dtype": str(lv.dtype),
            "time_us": dt * 1e6,
            "nnz_per_s": lv.A.nnz / dt if dt > 0 else float("inf"),
        })
    return rows


def vcycle_breakdown(hierarchy, params, rhs, n_iter: int = 20) -> dict:
    """Component times of one V-cycle, same names as print_vcycle_time."""
    lv0 = hierarchy.levels[0]
    r = jnp.asarray(rhs, dtype=lv0.dtype)

    out = {}
    sm = jax.jit(lambda u, b: smooth(lv0, params, u, b, params.preSmooth))
    out["smooth"] = _time(sm, jnp.zeros_like(r), r, n_iter=n_iter)
    resid = jax.jit(lambda u, b: lv0.A.matvec(u) - b)
    out["resid"] = _time(resid, jnp.zeros_like(r), r, n_iter=n_iter)
    if lv0.R is not None:
        Rmv = jax.jit(lambda v: lv0.R.matvec(v))
        out["Rtransfer"] = _time(Rmv, r, n_iter=n_iter)
        rc = jnp.ones(hierarchy.levels[1].n_pad, dtype=hierarchy.levels[1].dtype)
        Pmv = jax.jit(lambda v: lv0.P.matvec(v))
        out["Ptransfer"] = _time(Pmv, rc, n_iter=n_iter)
    lvc = hierarchy.levels[-1]
    rc2 = jnp.ones(lvc.n_pad, dtype=lvc.dtype)
    cs = jax.jit(lambda v: coarsest_solve(hierarchy, params, v))
    out["coarsest"] = _time(cs, rc2, n_iter=n_iter)
    full = jax.jit(lambda b: vcycle(hierarchy, params, jnp.zeros_like(b), b))
    out["total"] = _time(full, r, n_iter=n_iter)
    known = out["smooth"] + out["resid"] + out.get("Rtransfer", 0) + \
        out.get("Ptransfer", 0) + out["coarsest"]
    out["other"] = max(0.0, out["total"] - known)
    return out


def format_breakdown(bd: dict) -> str:
    lines = ["vcycle component times (avg):"]
    for k in ("smooth", "resid", "Rtransfer", "Ptransfer", "coarsest",
              "other", "total"):
        if k in bd:
            lines.append(f"  {k:<10} {bd[k] * 1e3:9.3f} ms")
    return "\n".join(lines)
