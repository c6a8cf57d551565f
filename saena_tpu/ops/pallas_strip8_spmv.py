"""Pallas multi-strip ("strip8") gather SpMV.

The single-strip tile of pallas_strip_spmv.py has a structural fill
ceiling on two operator families:

- SA-coarsened mid-level A (RCM-banded, ~40 nnz/row scattered over ~10
  strips): entries per (row-block, strip) tile are sparse, measured ~20%
  slot fill and a VPU-op-bound 47 us matvec on the 48^3 lean level 1.
- Aggregation transposes Pt^T (the SmoothedR workhorse): every x strip of
  128 fine columns holds AT MOST 128 one-entry-per-column entries, so any
  tile keyed to one strip caps at 12.5% fill (measured 4%: 132 B/nnz).

Here a tile covers 128 consecutive rows (one row per LANE) and its 8
SUBLANES hold 8 independent strip slots: slot (i, j) of tile t belongs to
row rb*128 + j and gathers x from strip ``strips[t, i]`` — the vreg gather
indexes within the sublane's own 128-lane strip row. Up to 8 strips share
one tile, lifting both ceilings ~8x.

The kernel is a PURE MAP over tiles: each tile's (8, 128) contribution is
folded across sublanes (3 vector adds) and written to its own scratch row
— no output routing, masks, or first-visit logic in-kernel. The final
y[rb*128 + j] = sum over the row block's tiles is a 512-byte row gather of
the scratch plus a small reduce OUTSIDE the kernel (tiles of a row block
are consecutive; padding gathers a zero row). That asymmetry is the point:
padding the 512 B scratch rows is ~10x cheaper than padding 5 KB tiles,
so the GROUP padding that dominated the old layout's footprint vanishes.

Traffic = 5 bytes/slot (int8 lane idx + f32 val; 3 at bf16) at ~80% fill
on both problem families. The reference's moral equivalent is the remote
CSC accumulation loop of matvec_sparse (saena_matrix_matvec.cpp:96-109).

Applicability: x strips + scratch must fit VMEM/SMEM budgets — mid/coarse
AMG operators and transfers, like the single-strip kernel. Built at setup
by ``strip8_from_csr``; format selection picks by bytes estimate.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from saena_tpu.ops.formats import pad_to, to_device, _register, _static

GROUP8 = 64          # tiles per grid step (amortizes ~0.3 us/step overhead)
UNROLL8 = 8          # static unroll width inside the fori_loop
RPT8 = 128           # rows per tile at perrow=1 (compat)
_PERROW8 = (1, 2, 4)  # lanes per (row, strip-slot): perrow > 1 smooths
                      # lumpy per-(row, strip) counts (aggregation
                      # transposes) at Q = 128/perrow rows per tile


@_register
@dataclasses.dataclass(frozen=True)
class Strip8Matrix:
    """Multi-strip gather sparse matrix for the strip8 Pallas SpMV."""

    idx: jax.Array          # (n_tiles, 8, 128) int8 — lane idx within strip
    vals: jax.Array         # (n_tiles, 8, 128)
    strips: jax.Array       # general mode: (n_tiles * 8,) int32 strip id
                            # per sublane; interval mode: (n_tiles,) int32
                            # strip BASE per tile (sublane i = base + i)
    gather_idx: jax.Array   # (n_rb, t_max) int32 — tile rows to sum per rb
                            # (padding = the appended zero row)
    shape: tuple = _static()
    nnz: int = _static()
    perrow: int = _static(default=1)    # lane groups per (row, slot)
    mode: str = _static(default="general")
    n_cols_pad: int = _static(default=0)
    n_out: int = _static(default=0)     # caller's padded length (128-mult)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def n_pad(self) -> int:
        return self.n_out

    def matvec(self, x: jax.Array) -> jax.Array:
        y = strip8_spmv(self, x, interpret=jax.default_backend() == "cpu")
        n_rows = y.shape[0]
        if n_rows < self.n_out:
            return jnp.pad(y, (0, self.n_out - n_rows))
        return y[: self.n_out]

    def astype(self, dtype) -> "Strip8Matrix":
        return dataclasses.replace(self, vals=self.vals.astype(dtype))


def _kernel(strips, x_ref, idx_ref, vals_ref, o_ref, *, mode: str):
    """One grid step: GROUP8 tiles -> GROUP8 folded scratch rows."""
    p = pl.program_id(0)

    def body(t, _):
        rows = []
        for kk in range(UNROLL8):                     # static inner block
            k = t * UNROLL8 + kk
            g = p * GROUP8 + k
            if mode == "interval":
                # sublane i = strip base + i: ONE dynamic 8-row slice
                src = x_ref[pl.ds(strips[g], 8), :]
            else:
                # build the (8, 128) source: one strip row per sublane
                src = jnp.concatenate(
                    [x_ref[strips[g * 8 + i], :].reshape(1, 128)
                     for i in range(8)], axis=0)
            lane_idx = idx_ref[k].astype(jnp.int32)
            gat = jnp.take_along_axis(src, lane_idx, axis=1)
            c = vals_ref[k] * gat                     # (8, 128)
            c = c[0:4] + c[4:8]                       # fold sublanes
            c = c[0:2] + c[2:4]
            rows.append(c[0] + c[1])                  # (128,)
        o_ref[pl.ds(t * UNROLL8, UNROLL8), :] = jnp.stack(rows)
        return 0

    jax.lax.fori_loop(0, GROUP8 // UNROLL8, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def strip8_spmv(A: Strip8Matrix, x: jax.Array, interpret: bool = False):
    n_tiles = A.idx.shape[0]
    assert n_tiles % GROUP8 == 0
    n_groups = n_tiles // GROUP8
    n_strips = A.n_cols_pad // 128
    # x and the accumulator stay >= f32 (bf16 reduces only streamed VALUES;
    # Mosaic cannot load a dynamic single row from a bf16 memref)
    cdt = jnp.promote_types(A.dtype, jnp.float32)
    xs = x.astype(cdt).reshape(n_strips, 128)
    if A.mode == "interval" and n_strips < 8:
        xs = jnp.pad(xs, ((0, 8 - n_strips), (0, 0)))
        n_strips = 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((n_strips, 128), lambda p, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP8, 8, 128), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP8, 8, 128), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GROUP8, 128), lambda p, *_: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    scratch = pl.pallas_call(
        functools.partial(_kernel, mode=A.mode),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 128), cdt),
        grid_spec=grid_spec,
        interpret=interpret,
    )(A.strips, xs, A.idx, A.vals)
    return _reduce_scratch(A, scratch, cdt)


def _reduce_scratch(A: Strip8Matrix, scratch, cdt):
    # per-row-block reduction: 512 B row gather + sum (padding slots point
    # at the appended zero row); lane j of a row block belongs to row
    # rb*Q + (j % Q), so the perrow lane groups fold here too
    scratch0 = jnp.concatenate(
        [scratch, jnp.zeros((1, 128), dtype=cdt)], axis=0)
    y = jnp.take(scratch0, A.gather_idx, axis=0).sum(axis=1)   # (n_rb, 128)
    if A.perrow > 1:
        n_rb = y.shape[0]
        y = y.reshape(n_rb, A.perrow, 128 // A.perrow).sum(axis=1)
    return y.reshape(-1)


@jax.jit
def strip8_spmv_xla(A: Strip8Matrix, x: jax.Array):
    """Pure-XLA emulation of the strip8 kernel — bit-for-bit the same
    arithmetic (same per-slot products, same sublane/row-block reduction
    order on a (T, 8, 128) layout), usable where the Pallas call is not
    (inside shard_map on CPU meshes; sharded tests/dryruns)."""
    n_tiles = A.idx.shape[0]
    n_strips = A.n_cols_pad // 128
    cdt = jnp.promote_types(A.dtype, jnp.float32)
    xs = x.astype(cdt).reshape(n_strips, 128)
    if A.mode == "interval":
        # strip base + sublane; pad so base+7 never reads past the end
        xs = jnp.pad(xs, ((0, 8), (0, 0)))
        rowidx = A.strips[:n_tiles, None] + jnp.arange(8)[None, :]
        src = jnp.take(xs, rowidx, axis=0)                    # (T, 8, 128)
    else:
        src = jnp.take(xs, A.strips[: n_tiles * 8].reshape(n_tiles, 8),
                       axis=0)
    gat = jnp.take_along_axis(src, A.idx.astype(jnp.int32), axis=2)
    c = A.vals.astype(cdt) * gat                              # (T, 8, 128)
    c = c[:, 0:4] + c[:, 4:8]                                 # same pairwise
    c = c[:, 0:2] + c[:, 2:4]                                 # fold as the
    scratch = c[:, 0] + c[:, 1]                               # kernel
    return _reduce_scratch(A, scratch, cdt)


# relative per-tile kernel cost: the general mode assembles its gather
# source with 8 scalar row loads (~26 ns/tile measured), the interval mode
# with one 8-row slice (~2x less); the planner weighs tile counts by these
_COST_GENERAL = 2.0
_COST_INTERVAL = 1.0

# above this nnz the candidate sweep ranks on a stratified row sample and
# only the winner gets the full-pattern plan (module constant so tests can
# lower it and compare sampled vs full picks)
SAMPLE_SWEEP_NNZ = 500_000


def _plan8_one(coo, n, m, perrow, mode):
    """Plan for one (perrow, mode) candidate (native core; the numpy
    fallback covers only the general mode)."""
    from saena_tpu import _native

    Q = 128 // perrow
    n_rb = pad_to(n, Q) // Q
    n_strips = pad_to(m) // 128
    if mode == "interval":
        nat = _native.strip8i_plan_core(coo.row, coo.col, n_rb, n_strips,
                                        perrow)
        if nat is None:
            return None
    else:
        nat = _native.strip8_plan_core(coo.row, coo.col, n_rb, n_strips,
                                       perrow)
        if nat is None:
            nat = _plan8_numpy(coo.row.astype(np.int64),
                               coo.col.astype(np.int64), n_rb, n_strips,
                               perrow)
    e_tile, e_sub, e_krem, tile_strips, rb_tiles = nat
    return (e_tile, e_sub, e_krem, tile_strips, rb_tiles, n_rb, n_strips,
            perrow, mode)


def _plan8(A: sp.spmatrix):
    """Host plan: entry -> (tile, sublane, lane group) + per-tile strips +
    rb tile counts, sweeping (perrow, mode) candidates and keeping the
    lowest-cost layout (tiles weighted by per-tile kernel cost). Native
    core (strip8plan.cpp); a numpy fallback covers toolchain-less installs.
    Memoized on the matrix object keyed by (shape, nnz) — setup probes the
    same CSR from format selection, bytes estimates, and the final
    conversion (same contract/caveats as pallas_strip_spmv._pick_cached)."""
    import time as _time

    A = A.tocsr()
    key = (A.shape, A.nnz)
    tok = getattr(A, "_saena_strip8_plan", None)
    if tok is not None and tok[0] == key:
        return tok[1]
    _t0 = _time.perf_counter()
    # read the panel hint BEFORE the sort-copy: A.copy() drops attributes,
    # and an unsorted panel silently falling back to the 6-candidate sweep
    # could pick a general-mode plan past the SMEM budget validated by
    # strip8_panel_slices (ADVICE r3)
    hint = getattr(A, "_saena_strip8_hint", None)
    orig = A
    if not A.has_sorted_indices:
        A = A.copy()
        A.sort_indices()
    n, m = A.shape
    coo = A.tocoo()
    best = None
    best_cost = None
    cands = ([(hint[0], hint[1],
               _COST_INTERVAL if hint[1] == "interval" else _COST_GENERAL)]
             if hint is not None else
             [(pr, mode, w) for pr in _PERROW8
              for mode, w in (("interval", _COST_INTERVAL),
                              ("general", _COST_GENERAL))])
    # Large operators rank the candidate sweep on a STRATIFIED row sample
    # (every stride-th 1024-row segment, rows rebased — whole segments so
    # the row-block structure every perrow candidate tiles over is
    # preserved; CLAUDE.md: a leading contiguous window misplans) and run
    # the full-pattern planner ONLY for the winner: the 6-candidate full
    # sweep was ~1.4 s of the 48^3 TPU setup. The pick is perf-only —
    # the full plan always re-runs on the real pattern.
    if len(cands) > 1 and coo.nnz > SAMPLE_SWEEP_NNZ:
        _SEG, _STRIDE = 1024, 8
        seg = coo.row // _SEG
        keep = (seg % _STRIDE) == 0
        if keep.any() and not keep.all():
            srow = (seg[keep] // _STRIDE) * _SEG + coo.row[keep] % _SEG
            scol = coo.col[keep]
            n_s = min(n, int(((n - 1) // _SEG // _STRIDE) * _SEG + _SEG))

            class _S:  # minimal coo-like view for _plan8_one
                row, col = srow, scol
            ranked = []
            for pr, mode, w in cands:
                p = _plan8_one(_S, n_s, m, pr, mode)
                if p is not None:
                    ranked.append((p[3].shape[0] * w, pr, mode, w))
            ranked.sort()
            # only the sampled winner gets the full plan; fall through to
            # the next-ranked candidate if the full pattern rejects it
            for _, pr, mode, w in ranked:
                p = _plan8_one(coo, n, m, pr, mode)
                if p is not None:
                    best, best_cost = (coo, p), p[3].shape[0] * w
                    cands = []
                    break
    for pr, mode, w in cands:
        p = _plan8_one(coo, n, m, pr, mode)
        if p is None:
            continue
        cost = p[3].shape[0] * w  # tiles weighted by per-tile cost
        if best is None or cost < best_cost:
            best, best_cost = (coo, p), cost
    res = best
    try:
        orig._saena_strip8_plan = (key, res)   # memo on the CALLER's matrix
    except AttributeError:
        pass
    try:      # setup-budget accounting (nested inside devicify_A/PR)
        from saena_tpu.amg.hierarchy import _timer
        _timer().add("plan_strip8", _time.perf_counter() - _t0)
    except Exception:
        pass
    return res


def _plan8_numpy(row, col, n_rb, n_strips, perrow=1):
    """Vectorized-ish fallback mirroring strip8plan.cpp exactly."""
    Q = 128 // perrow
    nnz = row.size
    e_tile = np.empty(nnz, dtype=np.int32)
    e_sub = np.empty(nnz, dtype=np.int8)
    e_krem = np.empty(nnz, dtype=np.int8)
    rb_tiles = np.zeros(n_rb, dtype=np.int32)
    strips_out = []
    n_tiles = 0
    rb_of = row // Q
    strip = col // 128
    starts = np.searchsorted(rb_of, np.arange(n_rb + 1))
    # per-(row, strip) running index k via run detection (entries sorted)
    same = np.zeros(nnz, dtype=bool)
    if nnz > 1:
        same[1:] = (row[1:] == row[:-1]) & (strip[1:] == strip[:-1])
    runb = np.flatnonzero(~same)
    k_all = np.arange(nnz) - runb[np.cumsum(~same) - 1]
    for rb in range(n_rb):
        lo, hi = starts[rb], starts[rb + 1]
        if lo == hi:
            continue
        s_blk = strip[lo:hi]
        k_blk = k_all[lo:hi]
        uniq = np.unique(s_blk)
        maxrep = np.zeros(uniq.size, dtype=np.int64)
        inv = np.searchsorted(uniq, s_blk)
        np.maximum.at(maxrep, inv, k_blk // perrow)
        widths = maxrep + 1
        bases = np.cumsum(widths) - widths
        ncols = int(widths.sum())
        t_rb = -(-ncols // 8)
        ts = np.zeros(t_rb * 8, dtype=np.int32)
        ts[:ncols] = np.repeat(uniq, widths).astype(np.int32)
        strips_out.append(ts.reshape(t_rb, 8))
        c = bases[inv] + k_blk // perrow
        e_tile[lo:hi] = n_tiles + c // 8
        e_sub[lo:hi] = (c % 8).astype(np.int8)
        e_krem[lo:hi] = (k_blk % perrow).astype(np.int8)
        rb_tiles[rb] = t_rb
        n_tiles += t_rb
    tile_strips = (np.concatenate(strips_out, axis=0)
                   if strips_out else np.zeros((0, 8), dtype=np.int32))
    return e_tile, e_sub, e_krem, tile_strips, rb_tiles


def strip8_from_csr(A: sp.spmatrix, dtype=jnp.float32,
                    smooth_dtype=None) -> Strip8Matrix:
    """Host conversion CSR -> multi-strip tiles. smooth_dtype: also return
    a twin sharing the index arrays (values host-cast; see formats.py)."""
    A = A.tocsr()
    n, m = A.shape
    coo, plan = _plan8(A)
    (e_tile, e_sub, e_krem, tile_strips, rb_tiles, n_rb, n_strips,
     perrow, mode) = plan
    Q = 128 // perrow
    n_tiles = tile_strips.shape[0]
    n_tiles_pad = max(GROUP8, -(-n_tiles // GROUP8) * GROUP8)

    from saena_tpu.ops.formats import scatter_value_dtype
    idx = np.zeros((n_tiles_pad, 8, 128), dtype=np.int8)
    vals = np.zeros((n_tiles_pad, 8, 128),
                    dtype=scatter_value_dtype(dtype, smooth_dtype))
    strips = np.zeros(
        n_tiles_pad if mode == "interval" else n_tiles_pad * 8,
        dtype=np.int32)
    if n_tiles:
        if mode == "interval":
            strips[:n_tiles] = tile_strips
        else:
            strips[: n_tiles * 8] = tile_strips.reshape(-1)
        lane = e_krem.astype(np.int64) * Q + coo.row % Q
        # single flat scatter (~2x a 3-axis fancy scatter on multi-Mnnz
        # conversions; same elements, same order)
        flat = (e_tile.astype(np.int64) * 8 + e_sub) * 128 + lane
        idx.reshape(-1)[flat] = (coo.col % 128).astype(np.int8)
        vals.reshape(-1)[flat] = coo.data

    t_max = max(1, int(rb_tiles.max())) if rb_tiles.size else 1
    gather_idx = np.full((n_rb, t_max), n_tiles_pad, dtype=np.int32)
    off = np.cumsum(rb_tiles) - rb_tiles
    for t in range(t_max):
        mask = rb_tiles > t
        gather_idx[mask, t] = off[mask] + t

    M = Strip8Matrix(
        idx=jnp.asarray(idx),
        vals=to_device(vals, dtype),
        strips=jnp.asarray(strips),
        gather_idx=jnp.asarray(gather_idx),
        shape=(n, m), nnz=int(A.nnz), perrow=perrow, mode=mode,
        n_cols_pad=n_strips * 128,
        n_out=pad_to(n),
    )
    if smooth_dtype is None:
        return M
    return M, dataclasses.replace(M, vals=to_device(vals, smooth_dtype))


def strip8_bytes_estimate(A: sp.spmatrix, dtype=jnp.float32) -> int:
    """Footprint (= streamed bytes per matvec) of the strip8 conversion,
    from tile counts only — used by format selection."""
    _, plan = _plan8(A)
    n_tiles = max(GROUP8, -(-plan[3].shape[0] // GROUP8) * GROUP8)
    return int(n_tiles * 8 * 128 * (1 + jnp.dtype(dtype).itemsize))


# v5e measured: general A1 960 tiles -> 26.0 us, R0 1344 -> 38.8 us,
# P0 1216 -> 37.1 us (~27-30 ns/tile: 8 scalar x-row loads dominate).
# Interval mode measured at scale: 48^3 default level-2 A, 15936 tiles ->
# 322 us = 20.2 ns/tile (the "one 8-row slice is ~2x cheaper" guess was
# optimistic and mis-ranked strip8 over single-strip there: 322 vs 234 us).
STRIP8_NS_PER_TILE = {"general": 29.0, "interval": 20.0}


def strip8_time_estimate(A: sp.spmatrix, dtype=jnp.float32) -> float:
    """Estimated matvec seconds from the planned tile count and mode —
    the strip8 kernel is bound by per-tile x-source assembly, not bytes."""
    from saena_tpu.ops.formats import KERNEL_LAUNCH_S

    _, plan = _plan8(A)
    mode = plan[8]
    n_tiles = max(GROUP8, -(-plan[3].shape[0] // GROUP8) * GROUP8)
    return KERNEL_LAUNCH_S + n_tiles * STRIP8_NS_PER_TILE[mode] * 1e-9


def strip8_panel_slices(A: sp.spmatrix, dtype=jnp.float32,
                        smem_budget: int = 512 * 1024):
    """Row-panel decomposition for operators whose planned tile count
    exceeds the SMEM prefetch budget in ONE call (the 512 KB gate below):
    the smallest panel count (2/4/8) whose every 128-aligned row panel is
    strip8_supported, as a tuple of CSR row slices sharing the full column
    space (x is the VMEM side and is shared across panel calls). Memoized
    on the matrix object like _plan8. None if panelling doesn't help."""
    A = A.tocsr()
    itemsize = max(4, jnp.dtype(dtype).itemsize)
    # itemsize is in the key: an f64 probe must not poison the cached
    # decomposition for a later f32 probe (the 4 MB x-VMEM gate differs)
    key = (A.shape, A.nnz, smem_budget, itemsize)
    tok = getattr(A, "_saena_strip8_panels", None)
    if tok is not None and tok[0] == key:
        return tok[1]
    res = None
    n, m = A.shape
    full = _plan8(A) if pad_to(m) * itemsize < 4 * 1024 * 1024 else None
    if full is not None:
        # panel feasibility straight from the FULL plan: tiles are per
        # row-block, panels are contiguous row-blocks, so per-panel tile
        # counts are exact prefix sums — no per-panel re-planning here
        plan = full[1]
        rb_tiles, perrow, mode = plan[4], plan[7], plan[8]
        per_tile = 4 if mode == "interval" else 32
        Q = 128 // perrow
        cum = np.concatenate([[0], np.cumsum(rb_tiles)])
        rb128 = pad_to(n) // 128
        for npanel in (2, 4, 8):
            btile = -(-rb128 // npanel)
            bounds = [min(n, i * btile * 128) for i in range(npanel + 1)]
            spans = [(b0, b1) for b0, b1 in zip(bounds, bounds[1:])
                     if b1 > b0]
            if len(spans) < 2:
                continue
            ok = True
            for b0, b1 in spans:
                t = int(cum[min(-(-b1 // Q), len(cum) - 1)] - cum[b0 // Q])
                t_pad = max(GROUP8, -(-t // GROUP8) * GROUP8)
                if t_pad * per_tile >= smem_budget:
                    ok = False
                    break
            if ok:
                parts = []
                for b0, b1 in spans:
                    p = A[b0:b1].tocsr()
                    # build with the full plan's layout — one planner pass
                    # per panel instead of the 6-candidate sweep
                    p._saena_strip8_hint = (perrow, mode)
                    parts.append(p)
                res = tuple(parts)
                break
    try:
        A._saena_strip8_panels = (key, res)
    except AttributeError:
        pass
    return res


def strip8_panels_time_estimate(A: sp.spmatrix, dtype=jnp.float32) -> float:
    parts = strip8_panel_slices(A, dtype)
    # ~2 us of launch + scratch-reduce overhead per extra panel call
    return (sum(strip8_time_estimate(p, dtype) for p in parts)
            + 2e-6 * (len(parts) - 1))


def strip8_panels_bytes_estimate(A: sp.spmatrix, dtype=jnp.float32) -> int:
    parts = strip8_panel_slices(A, dtype)
    return sum(strip8_bytes_estimate(p, dtype) for p in parts)


def strip8_panels_from_csr(A: sp.spmatrix, dtype=jnp.float32,
                           smooth_dtype=None):
    """Build the row-panelled strip8 composite (formats.RowPanels)."""
    from saena_tpu.ops.formats import RowPanels

    A = A.tocsr()
    parts = strip8_panel_slices(A, dtype)
    built = [strip8_from_csr(p, dtype=dtype, smooth_dtype=smooth_dtype)
             for p in parts]
    if smooth_dtype is None:
        return RowPanels(parts=tuple(built), shape=A.shape, nnz=int(A.nnz))
    M = RowPanels(parts=tuple(b for b, _ in built), shape=A.shape,
                  nnz=int(A.nnz))
    Msm = RowPanels(parts=tuple(s for _, s in built), shape=A.shape,
                    nnz=int(A.nnz))
    return M, Msm


def strip8_supported(A: sp.spmatrix, dtype=jnp.float32,
                     vmem_budget: int = 4 * 1024 * 1024,
                     smem_budget: int = 512 * 1024) -> bool:
    """x strips must fit VMEM; per-sublane strip ids live in SMEM.

    The SMEM check uses the PLANNED tile count, not the nnz/8 upper bound:
    dense-ish mid-level operators pack many entries per tile, so the bound
    overshoots ~50x and silently exiled exactly the operators strip8 is
    fastest on (lean 48^3 level-1 A: bound 1.8 MB, actual 60 KB, kernel
    1.9x faster than single-strip). _plan8 is memoized on the matrix, and
    format selection calls the time/bytes estimators right after — the plan
    is computed once either way."""
    n, m = A.shape
    itemsize = max(4, jnp.dtype(dtype).itemsize)
    if pad_to(m) * itemsize >= vmem_budget:
        return False
    # cheap accept: even the worst-case tile count fits SMEM
    n_tiles_ub = A.nnz // 8 + pad_to(n, RPT8) // RPT8 + GROUP8
    if n_tiles_ub * 8 * 4 < smem_budget:
        return True
    res = _plan8(A)
    if res is None:
        return False
    plan = res[1]
    n_tiles = max(GROUP8, -(-plan[3].shape[0] // GROUP8) * GROUP8)
    per_tile = 4 if plan[8] == "interval" else 32   # int32 / 8 x int32
    return n_tiles * per_tile < smem_budget
