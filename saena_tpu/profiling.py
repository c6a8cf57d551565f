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
        # floor of 300 extra iterations: a 20-iteration delta of a us-scale
        # kernel is far below the tunnel's ms-scale RPC jitter and reports
        # noise (the calibration overestimates est_iter_s when the fetch
        # itself costs ~26 ms)
        n_long = n_short + int(np.clip(0.04 / max(est_iter_s, 1e-9),
                                       300, 50_000))
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


def modeled_matvec_time(M):
    """Modeled matvec seconds for a BUILT device operator, from the SAME
    constants format selection ranks with (STRIP_NS_PER_PAIR,
    STRIP8_NS_PER_TILE, the BSR stream model). None for formats chosen
    structurally rather than by these constants (DIA/dense/ELL). bench.py
    compares this against measured per-level times so a drifted constant
    (VERDICT r3: the 15->20 ns strip8 interval recalibration) is caught at
    every bench run instead of after a mis-ranked format ships."""
    from saena_tpu.ops.formats import (
        BSR_STREAM_BPS, BSR_TIME_FACTOR, KERNEL_LAUNCH_S, BsrMatrix,
        ColPanels, RowPanels)
    from saena_tpu.ops.pallas_strip8_spmv import (
        STRIP8_NS_PER_TILE, Strip8Matrix)
    from saena_tpu.ops.pallas_strip_spmv import (STRIP_LAUNCH_S,
                                                 STRIP_NS_BY_PERROW,
                                                 STRIP_NS_PER_PAIR,
                                                 StripMatrix)

    if isinstance(M, StripMatrix):
        # BUILT pair count x the perrow's measured ns/pair (the r5
        # calibration was taken against built counts; the pick's sampled
        # count can underestimate the padding ~25%)
        ns = STRIP_NS_BY_PERROW.get(M.perrow, STRIP_NS_PER_PAIR)
        return STRIP_LAUNCH_S + M.vals.shape[0] * ns * 1e-9
    if isinstance(M, Strip8Matrix):
        return KERNEL_LAUNCH_S + \
            M.idx.shape[0] * STRIP8_NS_PER_TILE[M.mode] * 1e-9
    if isinstance(M, BsrMatrix):
        return KERNEL_LAUNCH_S + \
            float(M.blocks.nbytes) * BSR_TIME_FACTOR / BSR_STREAM_BPS
    if isinstance(M, (RowPanels, ColPanels)):
        parts = [modeled_matvec_time(p) for p in M.parts]
        if any(t is None for t in parts):
            return None
        return sum(parts) + 2e-6 * (len(parts) - 1)
    return None


def model_check(hierarchy, n_iter: int | None = None,
                include_transfers: bool = True) -> list[dict]:
    """Compare modeled vs measured per-level matvec times (the kernel-time
    model self-check). Returns rows for levels whose format has a model.

    ``include_transfers`` adds one row per level whose P AND R both have
    models: the pair is timed as the square chain v -> R(P(v)) in coarse
    space (rectangular operators cannot chain alone) and compared against
    model(P)+model(R) — broadening the evidence that the ranking
    constants are calibrated (VERDICT r4: a single A-format row is thin)."""
    rows = []
    for lv, meas in zip(hierarchy.levels, profile_matvecs(hierarchy, n_iter)):
        t_model = modeled_matvec_time(lv.A)
        if t_model is None:
            continue
        rows.append({
            "level": lv.lvl,
            "op": "A",
            "format": meas["format"],
            "modeled_us": round(t_model * 1e6, 2),
            "measured_us": round(meas["time_us"], 2),
            "ratio": round(meas["time_us"] / max(1e-9, t_model * 1e6), 3),
        })
    if include_transfers:
        for lv in hierarchy.levels[:-1]:
            if lv.P is None or lv.R is None:
                continue
            mP = modeled_matvec_time(lv.P)
            mR = modeled_matvec_time(lv.R)
            if mP is None or mR is None:
                continue
            if mP + mR < 12e-6:
                # us-scale pairs sit below the tunnel's slope-timing
                # noise floor (one bad RPC swings the measurement 10x —
                # an L5 pair read 3.2 us one run, 25 us the next) AND
                # chained launches pipeline (an L4 pair measures 1.8 us
                # against a 2x1.25 us serial launch floor); a measured
                # row there only emits spurious drift warnings
                continue

            def step(v, P, R):
                return R.matvec(P.matvec(v).astype(v.dtype)).astype(v.dtype)

            # coarse-space carry: P maps coarse->fine, R fine->coarse
            from saena_tpu.ops.formats import pad_to
            xc = jnp.ones(pad_to(lv.P.shape[1]), dtype=lv.dtype)
            t = _slope(step, xc, lv.P, lv.R, n_long=n_iter)
            model = mP + mR
            rows.append({
                "level": lv.lvl,
                "op": "P+R",
                "format": f"{type(lv.P).__name__}+{type(lv.R).__name__}",
                "modeled_us": round(model * 1e6, 2),
                "measured_us": round(t * 1e6, 2),
                "ratio": round(t / max(1e-12, model), 3),
            })
    return rows


def vcycle_breakdown(hierarchy, params, rhs, n_iter: int | None = None,
                     per_level: bool = False) -> dict:
    """Component times of one V-cycle, same names as print_vcycle_time.
    n_iter fixes the long-chain length (smoke tests); None adapts it.

    Components are measured on EVERY level (pre+post smooth, residual,
    R+P transfer pairs), so a mid-level regression localizes the way the
    reference's print_vcycle_time accumulators do (saena_object.cpp:
    593-615). per_level=True additionally returns the per-level rows under
    "levels"."""
    out = {}
    lv_rows = []
    smooth_t = resid_t = rp_t = 0.0
    for lv in hierarchy.levels[:-1]:
        r = jnp.ones(lv.n_pad, dtype=lv.dtype)

        def sm_step(v, lv, b):
            return smooth(lv, params, v, b, params.preSmooth)

        t_sm = _slope(sm_step, r, lv, r, n_long=n_iter)

        def resid_step(v, lv, b):
            return lv.A.matvec(v).astype(v.dtype) - b

        t_re = _slope(resid_step, r, lv, r, n_long=n_iter)

        t_rp = 0.0
        if lv.R is not None:
            def rp_step(v, lv):
                rc = lv.R.matvec(v)
                return lv.P.matvec(rc).astype(v.dtype)

            t_rp = _slope(rp_step, r, lv, n_long=n_iter)
        # pre+post smoothing both run per cycle
        w = (params.preSmooth + params.postSmooth) / max(1, params.preSmooth)
        smooth_t += t_sm * w
        resid_t += t_re
        rp_t += t_rp
        lv_rows.append({"level": lv.lvl, "n": lv.n,
                        "smooth_us": t_sm * w * 1e6,
                        "resid_us": t_re * 1e6,
                        "transfer_us": t_rp * 1e6})

    out["smooth"] = smooth_t
    out["resid"] = resid_t
    if rp_t:
        out["Rtransfer+Ptransfer"] = rp_t
    if per_level:
        out["levels"] = lv_rows

    lvc = hierarchy.levels[-1]
    rc2 = jnp.ones(lvc.n_pad, dtype=lvc.dtype)

    def cs_step(v, h):
        return coarsest_solve(h, params, v).astype(v.dtype)

    out["coarsest"] = _slope(cs_step, rc2, hierarchy, n_long=n_iter)

    def vc_step(v, h):
        return vcycle(h, params, jnp.zeros_like(v), v)

    lv0 = hierarchy.levels[0]
    r0 = jnp.asarray(rhs, dtype=lv0.dtype)
    out["total"] = _slope(vc_step, r0, hierarchy, n_long=n_iter)
    known = out["smooth"] + out["resid"] + \
        out.get("Rtransfer+Ptransfer", 0) + out["coarsest"]
    out["other"] = max(0.0, out["total"] - known)
    return out


def pcg_profile(hierarchy, params, n_iter: int | None = None) -> dict:
    """pCG per-iteration phase breakdown (ref solve_pCG_profile +
    PROFILE_PCG accumulators, saena_object_solve.cpp:2804-3597): seconds
    per iteration of the preconditioner apply (one V-cycle), the fine-level
    matvec, and the dot/axpy tail, plus the full iteration body — each a
    chained jitted stage timed by the fetch-time slope. ``other`` is the
    iteration minus the accounted phases (launch gaps, extra arithmetic)."""
    lv0 = hierarchy.levels[0]
    A0 = lv0.A
    x = jnp.ones(lv0.n_pad, dtype=lv0.dtype)
    zeros = jnp.zeros_like(x)

    def precond(v, h):
        return vcycle(h, params, jnp.zeros_like(v), v)

    def matvec(v, h):
        return h.levels[0].A.matvec(v).astype(v.dtype)

    def dots(v, h):
        # the CG update tail: two vdots, a safe divide, one axpy
        num = jnp.vdot(v, v)
        den = num + 1.0
        return v - (num / den) * v

    def iteration(v, h):
        rho = vcycle(h, params, jnp.zeros_like(v), v)
        w = h.levels[0].A.matvec(rho).astype(v.dtype)
        alpha = jnp.vdot(v, rho) / (jnp.vdot(rho, w) + 1.0)
        return v - alpha * w

    out = {}
    for name, step in (("precond", precond), ("matvec", matvec),
                       ("dots", dots), ("iteration", iteration)):
        out[name] = _slope(step, x, hierarchy, n_long=n_iter)
    out["other"] = max(0.0, out["iteration"] - out["precond"]
                       - out["matvec"] - out["dots"])
    return out


def profile_sharded_matvecs(sh, mesh, n_iter: int | None = None) -> list[dict]:
    """Per-level, per-PHASE matvec breakdown on the sharded hierarchy
    (VERDICT r1 #9) — the analog of the reference's part1..part6 matvec
    instrumentation (saena_matrix_matvec.cpp:553-634):

      pack   = gather of the send slots (vSend[i] = v[vIndex[i]], part1)
      comm   = pack + collective + concat (the halo exchange, part2/3/6)
      local  = total - comm (local SpMV work, part4/5)
      total  = the full sharded matvec

    On COMPRESSED configs (compress_halo / float_level wire) the rows carry
    the reference's full SIX-part split — pack / compress / comm(wire) /
    local / remote / decompress (VERDICT r4 #6): compress and decompress
    come from cumulative pack->encode->decode stages (decode runs on the
    locally-encoded buffer, identical shape/cost to the post-collective
    one), comm is the exchange minus those legs, and local/remote split
    the fused SpMV time by the halo-column nnz fraction (the TPU kernel
    intentionally processes local+halo in one pass; see _remote_frac).

    Each phase is a chained jitted stage run INSIDE shard_map over the
    mesh, timed with the two-length value-fetch slope like everything else
    (block_until_ready does not synchronize through the axon tunnel)."""
    from jax.sharding import PartitionSpec as P

    axis = sh.axis

    def _fold(v, w):
        # keep the stage live in the chain while preserving v's shape
        return v.at[0].add(jnp.sum(w).astype(v.dtype))

    def _phases(A):
        ph = {}
        plan = getattr(A, "plan", None)
        if plan is not None and plan.mode == "exchange":
            chunked = not hasattr(A, "cols")

            def _send(A, v):
                idx = A.plan.send_idx[0]
                return (jnp.take(v.reshape(-1, 128), idx, axis=0) if chunked
                        else jnp.take(v, idx, axis=0))

            ph["pack"] = lambda A, v: _fold(v, _send(A, v))
            if plan.compress:
                # compress/decompress legs (ref part6 + the ZFP
                # compress leg, saena_matrix_matvec.cpp:553-634 /
                # saena_matrix_zfp.cpp): cumulative stages pack->encode->
                # decode; the decode runs on the locally-encoded buffer
                # (identical shape/cost to the post-collective one, with
                # no wire in the way)
                from saena_tpu.parallel.halo import (int8_block_decode,
                                                     int8_block_encode)
                comp = plan.compress

                def _enc(A, v):
                    s = _send(A, v)
                    if comp == "int8_block":
                        return int8_block_encode(
                            s.reshape(s.shape[0], -1) if chunked else s)
                    return s.astype(jnp.dtype(comp))

                def _dec(A, v):
                    b = _enc(A, v)
                    if comp == "int8_block":
                        return int8_block_decode(b, v.dtype)
                    return b.astype(v.dtype)

                ph["pack_enc"] = lambda A, v: v.at[0].add(
                    jnp.sum(_enc(A, v).astype(v.dtype)).astype(v.dtype))
                ph["pack_enc_dec"] = lambda A, v: _fold(v, _dec(A, v))
            ph["comm"] = (lambda A, v: _fold(v, A.plan.extend(v))) \
                if hasattr(A, "cols") else \
                (lambda A, v: _fold(v, A.plan.extend_chunks(v)))
        elif hasattr(A, "_extend"):         # ShardedDia: slab ppermutes
            ph["comm"] = lambda A, v: _fold(v, A._extend(v, False))
        ph["total"] = lambda A, v: A.matvec(v)
        return ph

    def _remote_frac(A):
        """Fraction of the level's nonzero column references that land in
        the HALO region of the extended vector — the attribution key for
        splitting SpMV time into the reference's part4 (local) and part5
        (remote). The TPU kernels process local+halo in ONE fused pass
        (documented re-design: a separate remote pass would re-stream the
        operator), so the local/remote split is nnz-attributed at the
        shared stream rate rather than separately timed."""
        try:
            if hasattr(A, "cols"):               # ShardedEll
                cols = np.asarray(A.cols)
                vals = np.asarray(A.vals)
                valid = vals != 0
                if not valid.any():
                    return 0.0
                return float((cols >= A.plan.n_local)[valid].mean())
            if hasattr(A, "bcols"):              # ShardedBsr (chunk ids)
                bcols = np.asarray(A.bcols)
                return float((bcols >= A.plan.n_local // 128).mean())
        except Exception:
            pass
        return None

    def _slope_sharded(step, A, n_iter, n_rows):
        @partial(jax.jit, static_argnames=("n",))
        def chain(A, x, n):
            def body(A_loc, x_loc):
                def it(i, v):
                    w = step(A_loc, v)
                    return w / (1.0 + jnp.max(jnp.abs(w)))
                return jnp.sum(jax.lax.fori_loop(0, n, it, x_loc[0]))[None]

            s = jax.shard_map(
                body, mesh=mesh,
                in_specs=(jax.tree.map(lambda _: P(axis), A), P(axis)),
                out_specs=P(axis), check_vma=False)(A, x)
            return jnp.sum(s)

        D = mesh.devices.size
        x = jnp.ones((D, n_rows), dtype=A.dtype)

        n_short = 3
        float(chain(A, x, n_short))        # compile + first-exec upload
        if n_iter is None:
            t0 = time.perf_counter()
            float(chain(A, x, n_short))
            est = max(1e-7, (time.perf_counter() - t0 - 0.020) / n_short)
            n_long = n_short + int(np.clip(0.04 / est, 300, 50_000))
        else:
            n_long = max(n_iter, n_short + 1)
        float(chain(A, x, n_long))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(A, x, n_short))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(chain(A, x, n_long))
            tl = time.perf_counter() - t0
            reps.append((tl - ts) / (n_long - n_short))
        return max(1e-9, float(np.median(reps)))

    rows = []
    for lv in sh.sharded:
        A = lv.A
        n_rows = lv.inv_diag.shape[-1]
        phases = _phases(A)
        times = {}
        for name, step in phases.items():
            times[name] = _slope_sharded(step, A, n_iter, n_rows)
        comm = times.get("comm", 0.0)
        row = {
            "level": lv.lvl,
            "n": lv.n,
            "nnz": A.nnz,
            "format": type(A).__name__,
            "total_us": times["total"] * 1e6,
            "nnz_per_s": A.nnz / times["total"],
        }
        if "pack" in times:
            row["pack_us"] = times["pack"] * 1e6
        if comm:
            mv = max(0.0, times["total"] - comm)
            if "pack_enc" in times:
                # SIX-part split on compressed configs (ref
                # saena_matrix_matvec.cpp:553-634 part1..part6): pack /
                # compress / comm(wire) / local / remote / decompress
                enc = max(0.0, times["pack_enc"] - times["pack"])
                dec = max(0.0, times["pack_enc_dec"] - times["pack_enc"])
                row["compress_us"] = enc * 1e6
                row["decompress_us"] = dec * 1e6
                row["comm_us"] = max(0.0, comm - times["pack_enc_dec"]) * 1e6
            else:
                row["comm_us"] = comm * 1e6
            frac = _remote_frac(A)
            if frac is None:
                row["local_us"] = mv * 1e6
            else:
                row["local_us"] = mv * (1.0 - frac) * 1e6
                row["remote_us"] = mv * frac * 1e6
        rows.append(row)
    return rows


def format_sharded_profile(rows: list[dict]) -> str:
    six = any("compress_us" in r or "remote_us" in r for r in rows)
    hdr = "lvl        n         nnz  format        pack_us "
    if six:
        hdr += " comp_us  comm_us local_us remot_us  dcmp_us  total_us"
    else:
        hdr += " comm_us local_us  total_us"
    lines = [hdr]
    for r in rows:
        line = (f"{r['level']:<3} {r['n']:>8} {r['nnz']:>11}  "
                f"{r['format']:<12} "
                f"{r.get('pack_us', float('nan')):>8.2f} ")
        if six:
            line += (f"{r.get('compress_us', 0.0):>8.2f} "
                     f"{r.get('comm_us', float('nan')):>8.2f} "
                     f"{r.get('local_us', float('nan')):>8.2f} "
                     f"{r.get('remote_us', 0.0):>8.2f} "
                     f"{r.get('decompress_us', 0.0):>8.2f} ")
        else:
            line += (f"{r.get('comm_us', float('nan')):>8.2f} "
                     f"{r.get('local_us', float('nan')):>8.2f} ")
        line += f"{r['total_us']:>9.2f}"
        lines.append(line)
    return "\n".join(lines)


def format_breakdown(bd: dict) -> str:
    lines = ["vcycle component times (avg):"]
    for k in ("smooth", "resid", "Rtransfer+Ptransfer", "coarsest",
              "other", "total"):
        if k in bd:
            lines.append(f"  {k:<20} {bd[k] * 1e3:9.3f} ms")
    return "\n".join(lines)
