"""Pallas strip-gather SpMV.

The TPU's only efficient irregular lookup is Mosaic's vreg-local
``tpu.dynamic_gather``: out[i, j] = src[i, idx[i, j]] on same-shape
(8, 128) tiles, indices within the 128 lanes. This kernel builds the whole
SpMV out of that primitive:

- x lives in VMEM as (n_strips, 128) — a "strip" is 128 consecutive values.
- Entries are grouped into PAIRS (row-block, strip, replica): all nonzeros
  whose row is in a ROWS_PER_TILE row block and whose column is in one
  strip. Each pair owns one (8, 128) tile of lane-local indices and values
  laid out so slot (i, j) belongs to row  base + i + 8*(j % Q)  with
  ``perrow`` entry slots per row (Q = 128 // perrow lanes per slot group):
  one gather + multiply + a perrow-slice reduction yields the block's row
  contributions.
- Output blocks cover ``krb`` consecutive row-blocks (a SUPERBLOCK); each
  pair's (8, Q) contribution is masked-accumulated into its row-block's
  slice of the superblock accumulator. Decoupling the grid GROUP padding
  from single row-blocks is what makes sparse-per-row operators (the AMG
  P/R transfer matrices, ~4 nnz/row) efficient: padding is per superblock,
  not per row-block (measured 200 MB -> 15 MB of streamed tiles on the
  97k x 12k smoothed-aggregation P).

``perrow`` and ``krb`` are chosen PER MATRIX at setup by a host cost model
(streamed bytes + VPU mask work); well-filled operators get krb=1 which
degenerates to the plain one-row-block-per-step kernel.

Traffic = 5 bytes/slot (int8 lane idx + f32 val; 3 at bf16) at the packing
factor the planner minimizes. The reference's moral equivalent is the CSR local loop
(saena_matrix_matvec.cpp:68-80); the design notes for why naive gather
kernels fail on this hardware are in pallas_spmv.py and CLAUDE.md.

Applicability: x (as strips) + y must fit in VMEM alongside a few tiles —
AMG mid/coarse levels and P/R transfers. Built at setup by
``strip_from_csr``.
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

GROUP = 64            # pairs processed per grid step: amortizes the
                      # ~0.3 us/step grid overhead (measured 3.1 ms at 11.5k
                      # steps at GROUP=1 vs 350 us at GROUP=16). The body
                      # runs GROUP/UNROLL fori_loop iterations of an
                      # UNROLL-wide static block: a fully unrolled GROUP=32
                      # body stalls the Mosaic compiler, a rolled loop not.
UNROLL = 16           # static unroll width inside the fori_loop
ROWS_PER_TILE = 8 * (128 // 4)   # rows/tile at the default perrow=4 (compat)

_PERROW_CANDIDATES = (1, 2, 4, 8, 16)
_KRB_CANDIDATES = (1, 2, 4, 8, 16, 32)


def _rpt(perrow: int) -> int:
    return 8 * (128 // perrow)


@_register
@dataclasses.dataclass(frozen=True)
class StripMatrix:
    """Strip-gather sparse matrix for the Pallas SpMV kernel."""

    idx: jax.Array          # (n_pairs, 8, 128) int8 — lane index within strip
                            # (lanes are 0..127 so int8 is lossless; 4x less
                            # streamed index traffic, widened in-register)
    vals: jax.Array         # (n_pairs, 8, 128)
    strip_of: jax.Array     # (n_pairs,) int32 — x strip id per pair
    rb_local: jax.Array     # (n_pairs,) int32 — row-block id WITHIN superblock
    sb_of: jax.Array        # (n_groups,) int32 — superblock id per GROUP step
    shape: tuple = _static()
    nnz: int = _static()
    perrow: int = _static(default=4)       # entry slots per row per tile
    krb: int = _static(default=1)          # row-blocks per output superblock
    n_rows_pad: int = _static(default=0)   # internal padding (n_sb*krb*RPT)
    n_cols_pad: int = _static(default=0)
    n_out: int = _static(default=0)        # caller's padded length (128-mult)
    pick_pairs: int = _static(default=0)   # the winning plan's padded pair
                                           # count at build time
                                           # (diagnostic; the time model
                                           # uses vals.shape[0], which
                                           # equals this after the
                                           # build-time tie resolution)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def n_pad(self) -> int:
        return self.n_out or self.n_rows_pad

    def matvec(self, x: jax.Array) -> jax.Array:
        # interpret mode makes the kernel runnable on CPU (tests/dry runs)
        y = strip_spmv(self, x, interpret=jax.default_backend() == "cpu")
        n_out = self.n_out or self.n_rows_pad
        if n_out > self.n_rows_pad:
            # rpt=64 layouts (perrow=16) can leave n_rows_pad a non-multiple
            # of 128; restore the caller's 128-padded length (ADVICE r1)
            return jnp.pad(y, (0, n_out - self.n_rows_pad))
        return y[:n_out] if n_out != self.n_rows_pad else y

    def astype(self, dtype) -> "StripMatrix":
        return dataclasses.replace(self, vals=self.vals.astype(dtype))


def _kernel(sb_of, strip_of, rb_local, x_ref, idx_ref, vals_ref, o_ref,
            *, perrow: int, krb: int):
    """Grid over GROUP-sized pair runs, SORTED by superblock. The output
    BLOCK (krb, 8, Q) is selected by the scalar-prefetch-driven index map
    (no in-kernel dynamic output indexing — that stalls the Mosaic
    compiler); a superblock's pairs are consecutive, so the block stays
    VMEM-resident across its accumulation run and starts from zeros on the
    first visit.

    Slot (i, j) of a tile belongs to row  i + 8*(j % Q)  with the perrow
    entry slots living in perrow contiguous Q-lane groups — the per-row
    reduction is perrow static lane slices (Mosaic supports neither
    lane-splitting reshapes nor strided lane slices). With krb > 1 the
    (8, Q) contribution is routed to its row-block by a broadcast multiply
    against an iota mask — all-static shapes, no dynamic VMEM writes."""
    Q = 128 // perrow
    p = pl.program_id(0)
    first = jnp.logical_or(
        p == 0, sb_of[p] != sb_of[jnp.maximum(p - 1, 0)])
    acc0 = jnp.where(first, jnp.zeros_like(o_ref[...]), o_ref[...])
    if krb > 1:
        iota = jax.lax.broadcasted_iota(jnp.int32, (krb, 8, Q), 0)

    def body(t, acc):
        for kk in range(UNROLL):                         # static inner block
            k = t * UNROLL + kk
            s = strip_of[p * GROUP + k]
            xs = x_ref[s, :]                             # (128,)
            src = jnp.broadcast_to(xs.reshape(1, 128), (8, 128))
            lane_idx = idx_ref[k].astype(jnp.int32)          # widen in vregs
            g = jnp.take_along_axis(src, lane_idx, axis=1)   # vreg gather
            contrib = vals_ref[k] * g                    # (8, 128)
            # per-row reduction over the perrow slot groups as a log2 lane
            # FOLD: lanes j and j + w share (j % Q) = the same row, so
            # halving sums slot pairs (m, m + perrow/2) — log2(perrow)
            # vector adds instead of perrow-1 (each sub-vreg slice add
            # costs a full vreg op on the VPU)
            c = contrib
            w = 64
            while w >= Q:
                c = c[:, :w] + c[:, w:2 * w]             # (8, w)
                w //= 2
            if krb == 1:
                acc = acc + c[None]
            else:
                rbl = rb_local[p * GROUP + k]
                mask = (iota == rbl).astype(c.dtype)
                acc = acc + mask * c[None]
        return acc

    o_ref[...] = jax.lax.fori_loop(0, GROUP // UNROLL, body, acc0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def strip_spmv(A: StripMatrix, x: jax.Array, interpret: bool = False):
    n_pairs = A.idx.shape[0]
    assert n_pairs % GROUP == 0
    n_groups = n_pairs // GROUP
    Q = 128 // A.perrow
    n_strips = A.n_cols_pad // 128
    n_rb = A.n_rows_pad // _rpt(A.perrow)
    # x and the accumulator stay >= f32: Mosaic cannot load a dynamic
    # single strip row from a bf16 memref (sublane packing), and f32
    # accumulation is better anyway — bf16 reduces only the streamed VALUES
    cdt = jnp.promote_types(A.dtype, jnp.float32)
    xs = x.astype(cdt).reshape(n_strips, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((n_strips, 128), lambda p, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 8, 128), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 8, 128), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (A.krb, 8, Q),
            lambda p, sb_of, strip_of, rb_local: (sb_of[p], 0, 0),
            memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, perrow=A.perrow, krb=A.krb),
        out_shape=jax.ShapeDtypeStruct((n_rb, 8, Q), cdt),
        grid_spec=grid_spec,
        interpret=interpret,
    )(A.sb_of, A.strip_of, A.rb_local, xs, A.idx, A.vals)
    # out[rb, i, q] = row rb*RPT + i + 8q -> linear order is (rb, q, i)
    return out.transpose(0, 2, 1).reshape(-1)


def _plan(row, col, n, m, perrow):
    """Pair layout for one perrow candidate. Returns
    (pair_rb, pair_strip, slot, inv, krb, padded_pairs, score)."""
    rpt = _rpt(perrow)
    n_strips = pad_to(m) // 128
    n_rows_pad = pad_to(n, rpt)
    n_rb = n_rows_pad // rpt

    # entry -> (slot within row, pair id) plus the sorted unique pair list.
    # Native core (stripplan.cpp): run-length slot assignment (canonical-CSR
    # entries are already (row, strip)-sorted) + radix pair dedup, O(nnz) —
    # replaces two O(nnz log nnz) numpy sorts
    from saena_tpu import _native
    nat = _native.strip_plan_core(row, col, rpt, n_strips, perrow) \
        if row.size else None
    if nat is not None:
        slot, inv, pair_rb, pair_strip = nat
        pair_rb = pair_rb.astype(np.int64)
    else:
        rb = row // rpt
        strip = col // 128
        # per (rb, strip, row) running slot index k; entries with k >=
        # perrow overflow into a REPEATED pair (same rb/strip, next replica)
        key_rsr = (rb.astype(np.int64) * n_strips + strip) * n_rows_pad + row
        order = np.argsort(key_rsr, kind="stable")
        k = np.zeros(row.size, dtype=np.int64)
        if row.size:
            kr = key_rsr[order]
            same = np.concatenate([[False], kr[1:] == kr[:-1]])
            breaks = np.flatnonzero(~same)
            seg_id = np.cumsum(~same) - 1
            starts = breaks[seg_id]
            k[order] = np.arange(row.size) - starts
        replica = k // perrow
        slot = k % perrow

        cap = 128 // perrow      # replica < cap (<=128 entries/row/strip)
        pkey = ((rb.astype(np.int64) * n_strips + strip) * cap
                + np.minimum(replica, cap - 1))
        if row.size:
            uniq, inv = np.unique(pkey, return_inverse=True)
        else:
            uniq = np.array([], dtype=np.int64)
            inv = np.array([], dtype=np.int64)
        pair_rb = (uniq // (cap * n_strips)).astype(np.int64)
        pair_strip = ((uniq // cap) % n_strips).astype(np.int32)

    # pick krb: traffic (padded pairs) vs VPU mask work (krb/2 cycles/pair)
    best = None
    for krb in _KRB_CANDIDATES:
        n_sb = -(-n_rb // krb)
        counts = np.bincount(pair_rb // krb, minlength=n_sb)
        padded = int(np.maximum(
            GROUP, ((counts + GROUP - 1) // GROUP) * GROUP).sum())
        # rank candidates by MODELED TIME: measured ns/pair grows with
        # perrow far faster than the old +perrow/4 nudge (see
        # STRIP_NS_BY_PERROW — pairs-alone mis-ranked pr=2 over pr=1 on
        # the 48^3 level-2 A, 219 vs 197 us); krb keeps its prior weight
        score = padded * (STRIP_NS_BY_PERROW.get(perrow, 20.5)
                          + krb / 2.0)
        if best is None or score < best[2]:
            best = (krb, padded, score)
    krb, padded_pairs, score = best
    return dict(pair_rb=pair_rb, pair_strip=pair_strip, inv=inv,
                slot=slot, krb=krb,
                padded_pairs=padded_pairs, score=score,
                n_rb=n_rb, n_rows_pad=n_rows_pad, n_strips=n_strips,
                perrow=perrow, rpt=rpt)


_SAMPLE_NNZ = 150_000     # planner decisions come from a STRATIFIED row
                          # sample above this size: the full 5-candidate
                          # sweep was 67 s of a 105 s TPU 48^3 setup
                          # (VERDICT r1 #3). 150k keeps the 48^3 fine-level
                          # A/P/R sweeps sampled too; picks at 150k match
                          # the 400k picks on every bundled workload.
_SEG = 1024               # sampling segment: whole tiles for every rpt
                          # candidate (rpt <= 1024), so the sampled layout
                          # is structurally faithful


def _pick_candidate(row, col, n, m, perrow=None):
    """Choose the perrow candidate — on a stratified row-segment sample
    when the operator is large; only the WINNER then gets a full _plan.
    Returns (perrow, padded_pairs) with padded_pairs scaled to full size
    when sampled. Sampling keeps every stride-th 1024-row segment across
    the WHOLE matrix (a leading contiguous window is unrepresentative for
    SA-coarsened operators — it cost 0.53 -> 0.87 ms on the lean V-cycle)
    and rebases rows so tile alignment is preserved."""
    cands = (perrow,) if perrow else _PERROW_CANDIDATES
    nnz = row.size
    if nnz > _SAMPLE_NNZ and perrow is None:
        stride = max(2, int(np.ceil(nnz / _SAMPLE_NNZ)))
        seg = row // _SEG
        keep = (seg % stride) == 0
        # rebase: kept segment k maps to slot k // stride
        rs = (seg[keep] // stride) * _SEG + (row[keep] % _SEG)
        cs = col[keep]
        kept = int(keep.sum())
        if kept:
            ns = int(rs.max()) + 1
            plans = [_plan(rs, cs, ns, m, pr) for pr in cands]
            plans.sort(key=lambda p: p["score"])
            # sampling keeps per-rb pair counts exact but jitters the
            # krb/GROUP-padding tradeoff, which can flip candidates whose
            # modeled times are within ~10% (measured: pr=2 edged pr=1 on
            # the 48^3 level-2 sample while the full pattern — and the
            # kernel, 219 vs 197 us — prefer pr=1). A CLOSE call (top two
            # within 25%) records the runner-up so strip_from_csr can
            # resolve it with full plans AT BUILD TIME — estimates stay
            # sample-cheap (full-planning at pick time cost ~1.6 s of the
            # 48^3 setup, mostly for operators where strip loses the
            # format race and is never built).
            best = plans[0]
            runner = (plans[1]["perrow"]
                      if len(plans) > 1
                      and plans[1]["score"] <= 1.25 * best["score"]
                      else None)
            return (best["perrow"],
                    int(best["padded_pairs"] * nnz / max(1, kept)),
                    runner)
    plans = [_plan(row, col, n, m, pr) for pr in cands]
    best = min(plans, key=lambda p: p["score"])
    return best["perrow"], int(best["padded_pairs"]), None


def _best_plan(row, col, n, m, perrow=None):
    pr, _, _ = _pick_candidate(row, col, n, m, perrow)
    return _plan(row, col, n, m, pr)


def _pick_cached(A: sp.spmatrix, perrow: int | None = None):
    """(perrow, padded_pairs, runner_up_perrow|None) for a CSR, memoized ON
    the matrix object keyed by (shape, nnz). ``runner_up_perrow`` is set
    when a SAMPLED pick was too close to call (within 25%) — the build
    resolves it with full plans; estimates use the sampled winner. The
    pick depends only on the sparsity pattern, and the full _plan always
    re-runs on the actual pattern at conversion time, so a stale cache
    entry can only cost optimality, never correctness. Setup probes the
    same host CSR from format selection, bytes estimates, and the final
    conversion — this collapses those repeated candidate sweeps."""
    A = A.tocsr()
    if perrow is not None:
        coo = A.tocoo()
        return _pick_candidate(coo.row, coo.col, A.shape[0], A.shape[1],
                               perrow)
    key = (A.shape, A.nnz)
    tok = getattr(A, "_saena_strip_pick", None)
    if tok is not None and tok[0] == key:
        return tok[1]
    import time as _time
    _t0 = _time.perf_counter()
    coo = A.tocoo()
    res = _pick_candidate(coo.row, coo.col, A.shape[0], A.shape[1])
    try:      # setup-budget accounting (nested inside devicify_A/PR)
        from saena_tpu.amg.hierarchy import _timer
        _timer().add("plan_strip", _time.perf_counter() - _t0)
    except Exception:
        pass
    try:
        A._saena_strip_pick = (key, res)
    except AttributeError:
        pass
    return res


def strip_from_csr(A: sp.spmatrix, dtype=jnp.float32,
                   perrow: int | None = None,
                   smooth_dtype=None) -> StripMatrix:
    """Host conversion CSR -> strip-gather pairs (planner picks perrow/krb
    unless ``perrow`` is forced). smooth_dtype: also return a twin sharing
    the index arrays, values uploaded at that dtype from the host (a device
    astype would cost a remote XLA compile per level)."""
    A = A.tocsr()
    n, m = A.shape
    coo = A.tocoo()
    pr, pick_padded, _runner = _pick_cached(A, perrow)
    pln = _plan(coo.row, coo.col, n, m, pr)
    if _runner is not None:
        # the sampled pick was too close to call — resolve with the full
        # pattern now that a strip is actually being BUILT (the sampled
        # jitter mis-ranked pr=2 over pr=1 on the 48^3 level-2 A: 219 vs
        # 197 us measured)
        pln2 = _plan(coo.row, coo.col, n, m, _runner)
        if pln2["score"] < pln["score"]:
            pln = pln2
    pick_padded = pln["padded_pairs"]   # build-exact for the time model
    pr, krb, rpt = pln["perrow"], pln["krb"], pln["rpt"]
    Q = 128 // pr
    n_rb = pln["n_rb"]
    n_sb = -(-n_rb // krb)
    n_rb_pad = n_sb * krb
    n_rows_pad = n_rb_pad * rpt
    n_strips = pln["n_strips"]
    n_cols_pad = n_strips * 128

    pair_rb, pair_strip = pln["pair_rb"], pln["pair_strip"]
    pair_sb = pair_rb // krb
    counts = np.bincount(pair_sb, minlength=n_sb)
    padded = np.maximum(GROUP, ((counts + GROUP - 1) // GROUP) * GROUP)
    offsets = np.cumsum(padded) - padded
    n_pairs = int(padded.sum())

    # position of each real pair inside the padded (sb-major) layout
    within = np.arange(pair_rb.size) - (np.cumsum(counts) - counts)[pair_sb]
    pos = offsets[pair_sb] + within

    from saena_tpu.ops.formats import scatter_value_dtype
    idx = np.zeros((n_pairs, 8, 128), dtype=np.int8)
    vals = np.zeros((n_pairs, 8, 128),
                    dtype=scatter_value_dtype(dtype, smooth_dtype))
    strip_of = np.zeros(n_pairs, dtype=np.int32)
    rb_local = np.zeros(n_pairs, dtype=np.int32)
    if pair_rb.size:
        strip_of[pos] = pair_strip
        rb_local[pos] = (pair_rb % krb).astype(np.int32)
        sub = coo.row % 8
        q = (coo.row % rpt) // 8
        # slot groups are contiguous lanes (int64: the native core returns
        # int8 slots and Q can be 128)
        j = pln["slot"].astype(np.int64) * Q + q
        # one FLAT scatter instead of a 3-axis fancy scatter: numpy
        # resolves a single raveled index array ~2x faster on the
        # multi-Mnnz conversions (same elements, same order)
        flat = (pos[pln["inv"]].astype(np.int64) * 8 + sub) * 128 + j
        idx.reshape(-1)[flat] = (coo.col % 128).astype(np.int8)
        vals.reshape(-1)[flat] = coo.data
    sb_of = np.repeat(np.arange(n_sb), padded // GROUP).astype(np.int32)

    M = StripMatrix(
        idx=jnp.asarray(idx),
        vals=to_device(vals, dtype),
        strip_of=jnp.asarray(strip_of),
        rb_local=jnp.asarray(rb_local),
        sb_of=jnp.asarray(sb_of),
        shape=(n, m), nnz=int(A.nnz),
        perrow=pr, krb=krb,
        n_rows_pad=n_rows_pad, n_cols_pad=n_cols_pad,
        n_out=pad_to(n), pick_pairs=int(pick_padded),
    )
    if smooth_dtype is None:
        return M
    return M, dataclasses.replace(M, vals=to_device(vals, smooth_dtype))


def strip_bytes_estimate(A: sp.spmatrix, dtype=jnp.float32) -> int:
    """Footprint the strip conversion would need (for format selection) —
    planner score from a row-block sample on large operators (exact plan
    on small ones), so format selection never pays a full-nnz sweep."""
    _, padded, _ = _pick_cached(A.tocsr())
    return int(padded * 8 * 128 * (1 + jnp.dtype(dtype).itemsize))


# v5e AFFINE model, recalibrated r5 at >10k pairs per CLAUDE.md's rule
# (the single 22 ns/pair constant was fit at 2-5k pairs and overestimated
# the 48^3 level-2 operator 1.45x — model_check r4 ratio 0.689).
# The per-pair cost depends on PERROW (more slots per row = more in-tile
# select/blend work per pair), measured on the 48^3 level-2 A with each
# perrow forced (BUILT pair counts):
#   pr=1 17088 pairs -> 196.7 us (11.4 ns) | pr=2 15424 -> 219.2 (14.1)
#   pr=4 14528 -> 290.3 (19.9)            | pr=8 14080 -> 327.7 (23.2)
# small-op cross-check: A1_16 pr=4 256 pairs -> 6.78 us (21.6 net) fits.
# pr=16 is extrapolated. Minimizing pairs ALONE mis-ranked pr=2 over
# pr=1 on the hottest V-cycle operator (219 vs 197 us).
STRIP_NS_BY_PERROW = {1: 11.4, 2: 14.1, 4: 19.9, 8: 23.2, 16: 30.0}
STRIP_NS_PER_PAIR = 20.5          # legacy scalar (mid-perrow average)
STRIP_LAUNCH_S = 1.25e-6


def strip_time_estimate(A: sp.spmatrix, dtype=jnp.float32) -> float:
    """Estimated matvec seconds. The strip kernel is VPU-op bound, not
    byte bound: cost = per-call launch/prolog + GROUP-padded pair count
    at the picked perrow's ns/pair (fill cancels out). Used by time-based
    format selection against strip8/BSR estimates."""
    pr, padded, _ = _pick_cached(A.tocsr())
    ns = STRIP_NS_BY_PERROW.get(pr, STRIP_NS_PER_PAIR)
    return STRIP_LAUNCH_S + padded * ns * 1e-9


def strip_supported(A: sp.spmatrix, dtype=jnp.float32,
                    vmem_budget: int = 4 * 1024 * 1024,
                    smem_budget: int = 512 * 1024) -> bool:
    """x strips + y must fit in VMEM alongside the streamed tiles, and the
    scalar-prefetch pair metadata (strip_of + rb_local int32 per pair +
    sb_of per group ~ 8 B/pair) must fit SMEM: a 34 Mnnz 96^3 mid level
    planned ~139k pairs = 1.11 MB and blew the 1 MB physical SMEM at
    compile time — the budget keeps headroom for spill slots."""
    n, m = A.shape
    itemsize = jnp.dtype(dtype).itemsize
    if (pad_to(m) + pad_to(n, 1024)) * itemsize >= vmem_budget:
        return False
    _, padded, _ = _pick_cached(A.tocsr())
    return padded * 8 + (padded // GROUP + 1) * 4 < smem_budget
