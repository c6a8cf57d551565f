"""Profiling surfaces mirroring the reference's instrumentation:

- profile_matvecs: per-level SpMV timing (ref saena_object.cpp:618-697)
- vcycle_breakdown: Rtransfer/Ptransfer/smooth/coarsest/resid components
  (ref print_vcycle_time, saena_object.cpp:593-615; PROFILE_VCYCLE
  accumulators saena_object.h:432-445)

Timing method: each stage is chained inside a jitted fori_loop returning a
scalar, and per-iteration cost is the slope between two loop lengths with
VALUE-FETCH synchronization — on tunneled TPU deployments
``block_until_ready`` does not synchronize and each fetch carries fixed RPC
overhead, which the slope removes (see bench.py / CLAUDE.md).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from saena_tpu.amg.cycles import coarsest_solve, vcycle
from saena_tpu.amg.smoothers import smooth


@partial(jax.jit, static_argnames=("step", "n"))
def _chain(step, x, n, *args):
    def body(i, v):
        w = step(v, *args)
        return w / (1.0 + jnp.max(jnp.abs(w)))
    return jnp.sum(jax.lax.fori_loop(0, n, body, x))


def _slope(step, x, *args, n_short=3, n_long=None, est_iter_s=None):
    """Per-iteration seconds via the fetch-time slope of two chain lengths.

    The long chain is sized so its delta over the short one is ~40 ms of
    REAL device work — far above the tunnel's ms-scale RPC jitter. A fixed
    short chain underflows for us-scale kernels (23 x 3 us = 70 us << RPC
    jitter) and reports nonsense; pass est_iter_s (e.g. a bytes/BW roofline)
    or let one calibration run estimate it."""
    if n_long is not None and n_long <= n_short:
        n_short = max(1, n_long - 1)   # keep a measurable delta (smoke tests)
    float(_chain(step, x, n_short, *args))      # compile + first-exec upload
    if n_long is None:
        if est_iter_s is None:
            # calibrate from the short chain (no extra compile): fetch time
            # = one RPC + n_short iterations
            t0 = time.perf_counter()
            float(_chain(step, x, n_short, *args))
            est_iter_s = max(
                1e-7, (time.perf_counter() - t0 - 0.020) / n_short)
        n_long = n_short + int(np.clip(0.04 / max(est_iter_s, 1e-9),
                                       20, 50_000))
    float(_chain(step, x, n_long, *args))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(_chain(step, x, n_short, *args))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(_chain(step, x, n_long, *args))
        tl = time.perf_counter() - t0
        reps.append((tl - ts) / (n_long - n_short))
    return max(1e-9, float(np.median(reps)))


def profile_matvecs(hierarchy, n_iter: int | None = None) -> list[dict]:
    """Per-level matvec wall time + nnz/s (ref profile_matvecs).
    n_iter fixes the long-chain length (smoke tests); None sizes it
    adaptively so us-scale kernels measure above the RPC jitter."""
    rows = []
    for lv in hierarchy.levels:
        x = jnp.ones(lv.n_pad, dtype=lv.dtype)

        def step(v, A):
            # reduced-precision operators return their own dtype; keep the
            # chain carry at the vector dtype (matvec-only mixed precision)
            return A.matvec(v).astype(v.dtype)

        dt = _slope(step, x, lv.A, n_long=n_iter)
        rows.append({
            "level": lv.lvl,
            "n": lv.n,
            "nnz": lv.A.nnz,
            "format": type(lv.A).__name__,
            "dtype": str(lv.dtype),
            "time_us": dt * 1e6,
            "nnz_per_s": lv.A.nnz / dt,
        })
    return rows


def vcycle_breakdown(hierarchy, params, rhs, n_iter: int | None = None) -> dict:
    """Component times of one V-cycle, same names as print_vcycle_time.
    n_iter fixes the long-chain length (smoke tests); None adapts it."""
    lv0 = hierarchy.levels[0]
    r = jnp.asarray(rhs, dtype=lv0.dtype)

    out = {}

    def sm_step(v, lv, b):
        return smooth(lv, params, v, b, params.preSmooth)

    out["smooth"] = _slope(sm_step, r, lv0, r, n_long=n_iter)

    def resid_step(v, lv, b):
        return lv.A.matvec(v) - b

    out["resid"] = _slope(resid_step, r, lv0, r, n_long=n_iter)

    if lv0.R is not None:
        def rp_step(v, lv):
            rc = lv.R.matvec(v)
            return lv.P.matvec(rc).astype(v.dtype)

        out["Rtransfer+Ptransfer"] = _slope(rp_step, r, lv0, n_long=n_iter)

    lvc = hierarchy.levels[-1]
    rc2 = jnp.ones(lvc.n_pad, dtype=lvc.dtype)

    def cs_step(v, h):
        return coarsest_solve(h, params, v).astype(v.dtype)

    out["coarsest"] = _slope(cs_step, rc2, hierarchy, n_long=n_iter)

    def vc_step(v, h):
        return vcycle(h, params, jnp.zeros_like(v), v)

    out["total"] = _slope(vc_step, r, hierarchy, n_long=n_iter)
    known = out["smooth"] + out["resid"] + \
        out.get("Rtransfer+Ptransfer", 0) + out["coarsest"]
    out["other"] = max(0.0, out["total"] - known)
    return out


def format_breakdown(bd: dict) -> str:
    lines = ["vcycle component times (avg):"]
    for k in ("smooth", "resid", "Rtransfer+Ptransfer", "coarsest",
              "other", "total"):
        if k in bd:
            lines.append(f"  {k:<20} {bd[k] * 1e3:9.3f} ms")
    return "\n".join(lines)
