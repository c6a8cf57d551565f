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

from saena_tpu.ops.formats import pad_to, _register, _static

PERROW = 4            # entry slots per row per pair tile
ROWS_PER_TILE = 8 * (128 // PERROW)   # 256 rows covered by one (8,128) tile


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
    n_rows_pad: int = _static(default=0)
    n_cols_pad: int = _static(default=0)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def n_pad(self) -> int:
        return self.n_rows_pad

    def matvec(self, x: jax.Array) -> jax.Array:
        return strip_spmv(self, x)

    def astype(self, dtype) -> "StripMatrix":
        return dataclasses.replace(self, vals=self.vals.astype(dtype))


def _kernel(strip_of, rowblk_of, x_ref, idx_ref, vals_ref, o_ref):
    """Grid over pairs; o_ref is the full output, accumulated in VMEM."""
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    s = strip_of[p]
    rb = rowblk_of[p]
    xs = x_ref[s, :]                                     # (128,)
    src = jnp.broadcast_to(xs.reshape(1, 128), (8, 128))
    g = jnp.take_along_axis(src, idx_ref[0], axis=1)     # vreg-local gather
    contrib = vals_ref[0] * g                            # (8, 128)
    # slot (i, j) -> row i + 8*(j // PERROW): reduce over the PERROW group
    red = contrib.reshape(8, 128 // PERROW, PERROW).sum(axis=2)  # (8, 32)
    # row-major within the block: rows = i + 8*q for q in [0, 32)
    rows = red.T.reshape(1, ROWS_PER_TILE)               # (1, 256) q-major
    cur = o_ref[rb, :]
    o_ref[rb, :] = cur + rows[0]


from jax.experimental import pallas as pl          # noqa: E402
from jax.experimental.pallas import tpu as pltpu   # noqa: E402


@functools.partial(jax.jit, static_argnames=("interpret",))
def strip_spmv(A: StripMatrix, x: jax.Array, interpret: bool = False):
    n_pairs = A.idx.shape[0]
    n_strips = A.n_cols_pad // 128
    n_rb = A.n_rows_pad // ROWS_PER_TILE
    xs = x.astype(A.dtype).reshape(n_strips, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((n_strips, 128), lambda p, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_rb, ROWS_PER_TILE), lambda p, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_rb, ROWS_PER_TILE), A.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(A.strip_of, A.rowblk_of, xs, A.idx, A.vals)
    return out.reshape(-1)


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
        k_sorted = np.zeros(coo.nnz, dtype=np.int64)
        run = 0
        # vectorized run-length position within equal-key runs
        breaks = np.flatnonzero(~same)
        seg_id = np.cumsum(~same) - 1
        starts = breaks[seg_id]
        k_sorted = np.arange(coo.nnz) - starts
        k[order] = k_sorted
    replica = k // PERROW
    slot_in_row = k % PERROW

    # pair key: (rb, strip, replica)
    n_strips = n_cols_pad // 128
    pkey = (rb.astype(np.int64) * n_strips + strip) * 64 + np.minimum(replica, 63)
    uniq, inv = np.unique(pkey, return_inverse=True)
    n_pairs = uniq.size if uniq.size else 1

    idx = np.zeros((n_pairs, 8, 128), dtype=np.int32)
    vals = np.zeros((n_pairs, 8, 128), dtype=np.float64)
    strip_of = np.zeros(n_pairs, dtype=np.int32)
    rowblk_of = np.zeros(n_pairs, dtype=np.int32)
    if uniq.size:
        strip_of[:] = ((uniq // 64) % n_strips).astype(np.int32)
        rowblk_of[:] = (uniq // (64 * n_strips)).astype(np.int32)
        j = q * PERROW + slot_in_row
        idx[inv, sub, j] = lane
        vals[inv, sub, j] = coo.data

    return StripMatrix(
        idx=jnp.asarray(idx),
        vals=jnp.asarray(vals, dtype=dtype),
        strip_of=jnp.asarray(strip_of),
        rowblk_of=jnp.asarray(rowblk_of),
        shape=(n, m), nnz=int(A.nnz),
        n_rows_pad=n_rows_pad, n_cols_pad=n_cols_pad,
    )
