"""Pallas strip-gather SpMV.

The TPU's only efficient irregular lookup is Mosaic's vreg-local
``tpu.dynamic_gather``: out[i, j] = src[i, idx[i, j]] on same-shape
(8, 128) tiles, indices within the 128 lanes. This kernel builds the whole
SpMV out of that primitive:

- x lives in VMEM as (n_strips, 128) — a "strip" is 128 consecutive values.
- Entries are grouped into PAIRS (row-block, strip): all nonzeros whose
  row is in a 256-row block and whose column is in one strip.
- Each pair owns one (8, 128) tile of lane-local indices and values laid
  out so slot (i, j) belongs to row  base + i + 8*(j // PERROW)  with
  PERROW=4 entry slots per row: one gather + multiply + a (j%4)-group
  reduction yields 256 row contributions, accumulated into y in VMEM.

Traffic = 5 bytes/slot (int8-able idx stored as int32 here + f32 val) at a
~1.5-2x padding factor — an order of magnitude less than the 8x128 BSR
blocks for the same operators, with lanes fully utilized. The reference's
moral equivalent is the CSR local loop (saena_matrix_matvec.cpp:68-80);
the design notes for why naive gather kernels fail on this hardware are
in pallas_spmv.py and CLAUDE.md.

Applicability: x (as strips) + y must fit in VMEM alongside a few tiles —
AMG mid/coarse levels. Built at setup by ``strip_from_csr``.
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

from saena_tpu.ops.formats import pad_to, _register, _static

PERROW = 4            # entry slots per row per pair tile
ROWS_PER_TILE = 8 * (128 // PERROW)   # 256 rows covered by one (8,128) tile
GROUP = 64            # pairs (all of one row-block) processed per grid step:
                      # amortizes the ~0.3 us/step grid overhead that would
                      # otherwise dominate (measured 3.1 ms at 11.5k steps at
                      # GROUP=1 vs 350 us at GROUP=16). The kernel body runs
                      # GROUP/UNROLL fori_loop iterations of an UNROLL-wide
                      # static block: a fully unrolled GROUP=32 body stalls
                      # the Mosaic compiler, the rolled loop does not.
UNROLL = 16           # static unroll width inside the fori_loop


@_register
@dataclasses.dataclass(frozen=True)
class StripMatrix:
    """Strip-gather sparse matrix for the Pallas SpMV kernel."""

    idx: jax.Array          # (n_pairs, 8, 128) int32 — lane index within strip
    vals: jax.Array         # (n_pairs, 8, 128)
    strip_of: jax.Array     # (n_pairs,) int32 — x strip id per pair
    rowblk_of: jax.Array    # (n_pairs,) int32 — 256-row block id per pair
    shape: tuple = _static()
    nnz: int = _static()
    n_rows_pad: int = _static(default=0)   # internal 256-row padding
    n_cols_pad: int = _static(default=0)
    n_out: int = _static(default=0)        # caller's padded length (128-mult)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def n_pad(self) -> int:
        return self.n_out or self.n_rows_pad

    def matvec(self, x: jax.Array) -> jax.Array:
        y = strip_spmv(self, x)
        n_out = self.n_out or self.n_rows_pad
        return y[:n_out] if n_out != self.n_rows_pad else y

    def astype(self, dtype) -> "StripMatrix":
        return dataclasses.replace(self, vals=self.vals.astype(dtype))


def _kernel(strip_of, rowblk_of, x_ref, idx_ref, vals_ref, o_ref):
    """Grid over pairs, SORTED by row-block. The output BLOCK (1, 8, 32) is
    selected by the scalar-prefetch-driven index map (no in-kernel dynamic
    output indexing — that stalls the Mosaic compiler); pairs of one
    row-block are consecutive, so the block stays VMEM-resident across its
    accumulation run and is zeroed on first visit.

    Slot (i, j) of a tile belongs to row  i + 8*(j % 32)  with the PERROW=4
    entry slots living in the four contiguous 32-lane quarters — the
    per-row reduction is four static lane slices (Mosaic supports neither
    lane-splitting reshapes nor strided lane slices)."""
    p = pl.program_id(0)
    first = jnp.logical_or(
        p == 0, rowblk_of[p] != rowblk_of[jnp.maximum(p - 1, 0)])

    @pl.when(first)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    def body(t, acc):
        for kk in range(UNROLL):                         # static inner block
            k = t * UNROLL + kk
            s = strip_of[p * GROUP + k]
            xs = x_ref[s, :]                             # (128,)
            src = jnp.broadcast_to(xs.reshape(1, 128), (8, 128))
            g = jnp.take_along_axis(src, idx_ref[k], axis=1)  # vreg gather
            contrib = vals_ref[k] * g                    # (8, 128)
            acc = acc + (contrib[:, 0:32] + contrib[:, 32:64]
                         + contrib[:, 64:96] + contrib[:, 96:128])
        return acc

    o_ref[0, :, :] = jax.lax.fori_loop(
        0, GROUP // UNROLL, body, o_ref[0, :, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def strip_spmv(A: StripMatrix, x: jax.Array, interpret: bool = False):
    n_pairs = A.idx.shape[0]
    assert n_pairs % GROUP == 0
    n_groups = n_pairs // GROUP
    n_strips = A.n_cols_pad // 128
    n_rb = A.n_rows_pad // ROWS_PER_TILE
    xs = x.astype(A.dtype).reshape(n_strips, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
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
            (1, 8, 128 // PERROW),
            lambda p, strip_of, rowblk_of: (rowblk_of[p], 0, 0),
            memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_rb, 8, 128 // PERROW), A.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(A.strip_of, A.rowblk_of, xs, A.idx, A.vals)
    # out[rb, i, q] = row rb*256 + i + 8q -> linear order is (rb, q, i)
    return out.transpose(0, 2, 1).reshape(-1)


def strip_from_csr(A: sp.spmatrix, dtype=jnp.float32) -> StripMatrix:
    """Host conversion CSR -> strip-gather pairs."""
    A = A.tocsr()
    n, m = A.shape
    n_rows_pad = pad_to(n, ROWS_PER_TILE)
    n_cols_pad = pad_to(m)
    coo = A.tocoo()
    rb = coo.row // ROWS_PER_TILE
    strip = coo.col // 128
    lane = coo.col % 128
    sub = coo.row % 8                       # sublane within the tile
    q = (coo.row % ROWS_PER_TILE) // 8      # PERROW-group within the lane dim

    # per (rb, strip, row) running slot index k; entries with k >= PERROW
    # overflow into a REPEATED pair (same rb/strip, next replica)
    order = np.lexsort((coo.col, coo.row))
    key_rsr = (rb.astype(np.int64) * (n_cols_pad // 128) + strip) * n_rows_pad \
        + coo.row
    k = np.zeros(coo.nnz, dtype=np.int64)
    if coo.nnz:
        kr = key_rsr[order]
        same = np.concatenate([[False], kr[1:] == kr[:-1]])
        # vectorized position within equal-key runs
        breaks = np.flatnonzero(~same)
        seg_id = np.cumsum(~same) - 1
        starts = breaks[seg_id]
        k[order] = np.arange(coo.nnz) - starts
    replica = k // PERROW
    slot_in_row = k % PERROW

    # pair key: (rb, strip, replica) — rb-major order keeps each row-block's
    # pairs CONSECUTIVE; every rb's run is padded to a multiple of GROUP
    # with zero filler pairs (and empty row-blocks get a filler run) so each
    # grid step's GROUP pairs share one output block.
    n_strips = n_cols_pad // 128
    n_rb_total = n_rows_pad // ROWS_PER_TILE
    pkey = (rb.astype(np.int64) * n_strips + strip) * 64 + np.minimum(replica, 63)
    uniq, inv = np.unique(pkey, return_inverse=True) if coo.nnz else \
        (np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    pair_rb = (uniq // (64 * n_strips)).astype(np.int64)
    pair_strip = ((uniq // 64) % n_strips).astype(np.int32)

    counts = np.bincount(pair_rb, minlength=n_rb_total)
    padded = np.maximum(GROUP, ((counts + GROUP - 1) // GROUP) * GROUP)
    offsets = np.cumsum(padded) - padded
    n_pairs = int(padded.sum())

    # position of each real pair inside the padded layout
    within = np.arange(uniq.size) - (np.cumsum(counts) - counts)[pair_rb]
    pos = offsets[pair_rb] + within

    idx = np.zeros((n_pairs, 8, 128), dtype=np.int32)
    vals = np.zeros((n_pairs, 8, 128), dtype=np.float64)
    strip_of = np.zeros(n_pairs, dtype=np.int32)
    if uniq.size:
        strip_of[pos] = pair_strip
        j = slot_in_row * (128 // PERROW) + q   # quarters are contiguous lanes
        idx[pos[inv], sub, j] = lane
        vals[pos[inv], sub, j] = coo.data
    rowblk_grp = np.repeat(np.arange(n_rb_total), padded // GROUP) \
        .astype(np.int32)                        # rb of each GROUP-step

    return StripMatrix(
        idx=jnp.asarray(idx),
        vals=jnp.asarray(vals, dtype=dtype),
        strip_of=jnp.asarray(strip_of),
        rowblk_of=jnp.asarray(rowblk_grp),
        shape=(n, m), nnz=int(A.nnz),
        n_rows_pad=n_rows_pad, n_cols_pad=n_cols_pad,
        n_out=pad_to(n),
    )


def strip_bytes_estimate(A: sp.spmatrix, dtype=jnp.float32) -> int:
    """Footprint the strip conversion would need (for format selection)."""
    A = A.tocsr()
    coo = A.tocoo()
    n_strips = pad_to(A.shape[1]) // 128
    key = ((coo.row // ROWS_PER_TILE).astype(np.int64) * n_strips
           + coo.col // 128)
    n_pairs = np.unique(key).size if coo.nnz else 1
    # replicas + GROUP padding inflate by a modest factor; 1.3 is typical
    return int(1.3 * n_pairs * 8 * 128 * (4 + jnp.dtype(dtype).itemsize))


def strip_supported(A: sp.spmatrix, dtype=jnp.float32,
                    vmem_budget: int = 4 * 1024 * 1024) -> bool:
    """x strips + y must fit in VMEM alongside the streamed tiles."""
    n, m = A.shape
    itemsize = jnp.dtype(dtype).itemsize
    return (pad_to(m) + pad_to(n, ROWS_PER_TILE)) * itemsize < vmem_budget
