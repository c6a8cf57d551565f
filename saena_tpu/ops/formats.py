"""Device sparse-matrix formats and SpMV.

TPU-first re-design of the reference's CSR-local/CSC-remote SpMV
(saena_matrix_matvec.cpp:9-113) and dense fallback (saena_matrix_dense.cpp).
The reference's scalar CSR loops cannot map to a vector unit; instead we use
static-shape, lane-aligned formats XLA fuses into a few wide ops:

- ``EllMatrix``: slot-major ELLPACK — cols/vals stored ``(width, n_pad)`` so
  the row dimension is the TPU lane dimension. SpMV = ``width`` gathers +
  multiply + tree-sum, all fused by XLA; rows longer than ``width`` spill to
  a small COO scatter-add tail (hybrid ELL, handles skewed SuiteSparse rows).
- ``DiaMatrix``: diagonal storage for banded/stencil matrices (Poisson,
  band_matrix): SpMV = static shifted slices × diagonals — pure VPU, no
  gather at all. This is the speed-of-light format for the reference's
  headline Laplacian workloads.
- ``DenseMatrix``: coarse levels switch to dense (ref saena_object_setup2.cpp:
  327-339) and ride the MXU.

Vector convention: every on-device vector in a "space" of logical size n is
padded to ``pad_to(n)`` (multiple of 128, the TPU lane count) with zeros.
All kernels preserve zero padding, so no slicing happens anywhere in the
solve hot path and every jitted shape is 128-aligned.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

PAD = 128  # lane alignment for all device arrays


def pad_to(n: int, m: int = PAD) -> int:
    return max(((n + m - 1) // m) * m, m)



def to_device(arr, dtype):
    """Upload a host array at its FINAL dtype: casting on the host first
    halves the tunnel bytes and avoids a device-side convert_element_type
    (~12 s of a 48^3 TPU setup was f64 uploads cast on device). Time is
    accounted to the active setup PhaseTimer's "upload" phase (nested
    inside devicify_A/devicify_PR — overlapping by design)."""
    import time as _time

    import numpy as _np
    t0 = _time.perf_counter()
    out = jnp.asarray(_np.asarray(arr, dtype=jnp.dtype(dtype)))
    try:
        from saena_tpu.amg.hierarchy import _timer
        _timer().add("upload", _time.perf_counter() - t0)
        _timer().add("upload_mb", out.nbytes / 1e6)
    except Exception:
        pass
    return out


def scatter_value_dtype(dtype, smooth_dtype=None):
    """numpy dtype for a converter's value-scatter buffer. When no reduced
    twin is requested and the target is a native numpy float, scattering
    f64 COO data straight into the target dtype rounds each element exactly
    like the build-f64-then-cast path — while skipping the f64 master
    allocation and the cast copy (the big mid-level conversions were ~35%
    allocation + cast)."""
    if smooth_dtype is not None:
        return np.float64
    d = jnp.dtype(dtype)
    if d == jnp.float32 or d == jnp.float64:
        return d
    return np.float64

def _register(cls):
    data = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")]
    meta = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static")]
    jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)
    return cls


def _static(**kw):
    return dataclasses.field(metadata={"static": True}, **kw)


# ---------------------------------------------------------------------------


@_register
@dataclasses.dataclass(frozen=True)
class EllMatrix:
    """Hybrid slot-major ELLPACK. cols/vals: (width, n_pad); padding slots
    have col=0, val=0. Spill triples hold rows whose nnz exceeds width."""

    cols: jax.Array            # (width, n_pad) int32
    vals: jax.Array            # (width, n_pad) dtype
    spill_rows: jax.Array      # (n_spill,) int32
    spill_cols: jax.Array      # (n_spill,) int32
    spill_vals: jax.Array      # (n_spill,) dtype
    shape: tuple = _static()   # logical (n_rows, n_cols)
    nnz: int = _static()

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def n_pad(self) -> int:
        return self.cols.shape[1]

    def matvec(self, x: jax.Array) -> jax.Array:
        """y = A @ x. x: (pad_to(n_cols),) → y: (pad_to(n_rows),)."""
        x = x.astype(self.dtype)
        gathered = jnp.take(x, self.cols, axis=0)          # (width, n_pad)
        y = jnp.sum(self.vals * gathered, axis=0)          # (n_pad,)
        if self.spill_rows.shape[0] > 0:
            contrib = self.spill_vals * jnp.take(x, self.spill_cols, axis=0)
            y = y.at[self.spill_rows].add(contrib)
        return y

    def astype(self, dtype) -> "EllMatrix":
        return dataclasses.replace(
            self, vals=self.vals.astype(dtype), spill_vals=self.spill_vals.astype(dtype)
        )


@_register
@dataclasses.dataclass(frozen=True)
class DiaMatrix:
    """Diagonal (DIA) storage: data[k, i] = A[i, i + offsets[k]].
    SpMV is a sum of statically shifted slices — no gathers."""

    data: jax.Array                 # (ndiag, n_pad)
    shape: tuple = _static()        # logical (n, n) — square only
    offsets: tuple = _static()      # static tuple of ints
    nnz: int = _static()

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def n_pad(self) -> int:
        return self.data.shape[1]

    def matvec(self, x: jax.Array) -> jax.Array:
        # x and the result stay at the COMPUTE dtype (>= f32): a bf16 twin
        # reduces only the streamed diagonal values — the kernel's dynamic
        # shifted loads come from the f32 VMEM scratch, and it accumulates
        # in f32 (same discipline as the strip kernels' cdt)
        x = x.astype(jnp.promote_types(self.dtype, jnp.float32))
        # TPU fast path: single-pass Pallas kernel, x resident in VMEM
        # (~36 B/row vs the XLA lowering's ~60+; see pallas_dia_spmv.py)
        from saena_tpu.ops.pallas_dia_spmv import dia_spmv, dia_supported

        if jax.default_backend() == "tpu" and \
                dia_supported(self.offsets, self.n_pad, self.dtype):
            return dia_spmv(self.data, x, self.offsets)
        return self.matvec_xla(x)

    def fused_update(self, x: jax.Array, rhs: jax.Array, dinv=None,
                     c: float = 1.0, add_x: bool = True) -> jax.Array:
        """y = [x +] c * [dinv *] (rhs - A@x) in ONE pass — the smoother /
        residual building block (see pallas_dia_spmv.dia_fused_update)."""
        from saena_tpu.ops.pallas_dia_spmv import (
            dia_fused_update, dia_supported)

        cdt = jnp.promote_types(self.dtype, jnp.float32)
        x = x.astype(cdt)
        if jax.default_backend() == "tpu" and \
                dia_supported(self.offsets, self.n_pad, self.dtype):
            return dia_fused_update(
                self.data, x, rhs.astype(cdt), self.offsets,
                dinv=None if dinv is None else dinv.astype(cdt),
                c=c, add_x=add_x)
        z = rhs.astype(cdt) - self.matvec(x)
        if dinv is not None:
            z = z * dinv.astype(cdt)
        if c != 1.0:
            z = z * c
        return x + z if add_x else z

    def matvec_xla(self, x: jax.Array) -> jax.Array:
        cdt = jnp.promote_types(self.dtype, jnp.float32)
        x = x.astype(cdt)
        np_ = self.n_pad
        lo = max(0, -min(self.offsets))
        hi = max(0, max(self.offsets))
        xp = jnp.pad(x, (lo, hi))
        y = jnp.zeros(np_, dtype=cdt)
        for k, off in enumerate(self.offsets):
            y = y + self.data[k].astype(cdt) * jax.lax.dynamic_slice(
                xp, (lo + off,), (np_,))
        return y

    def astype(self, dtype) -> "DiaMatrix":
        return dataclasses.replace(self, data=self.data.astype(dtype))


@_register
@dataclasses.dataclass(frozen=True)
class DenseMatrix:
    """Row-major dense block, padded; rides the MXU."""

    data: jax.Array            # (n_pad, m_pad)
    shape: tuple = _static()
    nnz: int = _static()

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def n_pad(self) -> int:
        return self.data.shape[0]

    def matvec(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        return jnp.dot(self.data, x, preferred_element_type=self.dtype)

    def astype(self, dtype) -> "DenseMatrix":
        return dataclasses.replace(self, data=self.data.astype(dtype))


@_register
@dataclasses.dataclass(frozen=True)
class BsrMatrix:
    """Block-sparse rows with (8, 128) dense blocks, rows in block-ELL
    layout. The per-element HBM gather of the ELL SpMV (≈1 elem/cycle on
    TPU) becomes a 512-byte block-row gather plus a batched MXU product —
    the dominant cost is streaming the blocks, so bandwidth reduction
    (RCM, applied at setup) keeps blocks-per-row small. This is the
    TPU-native format for the SA-coarsened mid-hierarchy operators whose
    irregular columns defeat DIA."""

    blocks: jax.Array           # (n_br, W, 8, 128)
    bcols: jax.Array            # (n_br, W) int32 — 128-chunk index into x
    shape: tuple = _static()
    nnz: int = _static()

    @property
    def dtype(self):
        return self.blocks.dtype

    @property
    def n_pad(self) -> int:
        return self.blocks.shape[0] * 8

    def matvec(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        n_br, W = self.bcols.shape
        xb = x.reshape(-1, 128)
        g = jnp.take(xb, self.bcols, axis=0)          # (n_br, W, 128)
        # batched (8, W*128) @ (W*128,) rides the MXU; memory-bound on blocks
        B = self.blocks.transpose(0, 2, 1, 3).reshape(n_br, 8, W * 128)
        y = jnp.einsum("rik,rk->ri", B, g.reshape(n_br, W * 128),
                       preferred_element_type=self.dtype)
        return y.reshape(-1)

    def astype(self, dtype) -> "BsrMatrix":
        return dataclasses.replace(self, blocks=self.blocks.astype(dtype))


@_register
@dataclasses.dataclass(frozen=True)
class RowPanels:
    """Horizontal concatenation of row-panel sub-matrices sharing one x.

    The panel trick for formats with per-call resource ceilings: the strip8
    kernel prefetches per-tile strip ids into SMEM (512 KB), so one call
    caps at ~16k planned tiles — row panels split the prefetch across
    independent calls while x (the VMEM-resident side) is shared. Same
    pattern as the DIA row panels (pallas_dia_spmv.dia_panels), driven
    from the format layer because the panel boundary changes the host
    PLAN, not just the kernel geometry."""

    parts: tuple               # row panels, top to bottom (each a format)
    shape: tuple = _static()
    nnz: int = _static()

    @property
    def dtype(self):
        return self.parts[0].dtype

    @property
    def n_pad(self) -> int:
        return sum(p.n_pad for p in self.parts)

    def matvec(self, x: jax.Array) -> jax.Array:
        return jnp.concatenate([p.matvec(x) for p in self.parts])

    def astype(self, dtype) -> "RowPanels":
        return dataclasses.replace(
            self, parts=tuple(p.astype(dtype) for p in self.parts))


@_register
@dataclasses.dataclass(frozen=True)
class ColPanels:
    """Vertical (column-range) panels summing into one y.

    The x-side twin of RowPanels: the strip kernels keep ALL x strips
    VMEM-resident (4 MB budget), so an operator with a multi-million-column
    x (restriction R at 2M-row fine levels) falls off every gather fast
    path and lands on the XLA per-element gather (~64 ms measured on the
    126^3 Poisson R). Column panels slice x into VMEM-sized windows; each
    panel is whatever gather format the time-ranked picker chooses for its
    column range, and y is the sum of panel contributions."""

    parts: tuple               # per-panel formats, left to right
    col_starts: tuple = _static()   # 128-aligned x offset per panel
    col_widths: tuple = _static()   # 128-multiple x slice length per panel
    shape: tuple = _static()
    nnz: int = _static()

    @property
    def dtype(self):
        return self.parts[0].dtype

    @property
    def n_pad(self) -> int:
        return self.parts[0].n_pad

    def matvec(self, x: jax.Array) -> jax.Array:
        y = None
        for p, c0, w in zip(self.parts, self.col_starts, self.col_widths):
            yi = p.matvec(jax.lax.slice(x, (c0,), (c0 + w,)))
            y = yi if y is None else y + yi
        return y

    def astype(self, dtype) -> "ColPanels":
        return dataclasses.replace(
            self, parts=tuple(p.astype(dtype) for p in self.parts))


DeviceMatrix = (EllMatrix | DiaMatrix | DenseMatrix | BsrMatrix | RowPanels
                | ColPanels)


# ---------------------------------------------------------------------------
# host-side converters (setup path, numpy)
# ---------------------------------------------------------------------------


def ell_from_csr(
    A: sp.spmatrix,
    dtype=jnp.float32,
    width: Optional[int] = None,
    width_quantile: float = 1.0,
    col_perm: Optional[np.ndarray] = None,
    smooth_dtype=None,
) -> EllMatrix:
    """Convert CSR to hybrid slot-major ELL.

    width defaults to the max row nnz; with width_quantile < 1 it is cut at
    that quantile and the tail spills to COO (for skewed Florida-style rows).

    smooth_dtype: also return a reduced-precision twin sharing the index
    arrays, with values uploaded at that dtype from the HOST — a device-side
    astype would cost one remote XLA compile per level (Options.smooth_dtype).
    """
    A = A.tocsr()
    if not A.has_sorted_indices:
        A = A.copy()          # don't reorder the caller's entry order
        A.sort_indices()
    n, m = A.shape
    nnz_per_row = np.diff(A.indptr)
    if width is None:
        if nnz_per_row.size == 0 or A.nnz == 0:
            width = 1
        elif width_quantile >= 1.0:
            width = int(nnz_per_row.max())
        else:
            q = int(np.quantile(nnz_per_row, width_quantile))
            width = max(1, q)
            # don't spill more than ~10% of nnz
            spill = int(np.maximum(nnz_per_row - width, 0).sum())
            if spill > 0.1 * A.nnz:
                width = int(nnz_per_row.max())
    width = max(1, width)

    n_pad = pad_to(n)
    cols = np.zeros((width, n_pad), dtype=np.int32)
    vals = np.zeros((width, n_pad), dtype=np.float64)
    take = np.minimum(nnz_per_row, width)

    # slot-major fill: slot k holds each row's k-th entry
    rows_idx = np.repeat(np.arange(n), take)
    slot_idx = _ranges(take)
    src = A.indptr[:-1].repeat(take) + slot_idx
    cols[slot_idx, rows_idx] = A.indices[src]
    vals[slot_idx, rows_idx] = A.data[src]

    # spill: entries beyond width
    over = nnz_per_row - take
    s_rows = np.repeat(np.arange(n), over).astype(np.int32)
    s_src = (A.indptr[:-1] + take).repeat(over) + _ranges(over)
    s_cols = A.indices[s_src].astype(np.int32)
    s_vals = A.data[s_src]

    if col_perm is not None:
        cols = col_perm[cols].astype(np.int32)
        s_cols = col_perm[s_cols].astype(np.int32)

    M = EllMatrix(
        cols=jnp.asarray(cols),
        vals=to_device(vals, dtype),
        spill_rows=jnp.asarray(s_rows),
        spill_cols=jnp.asarray(s_cols),
        spill_vals=to_device(s_vals, dtype),
        shape=(n, m),
        nnz=int(A.nnz),
    )
    if smooth_dtype is None:
        return M
    return M, dataclasses.replace(
        M, vals=to_device(vals, smooth_dtype),
        spill_vals=to_device(s_vals, smooth_dtype))


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated."""
    counts = counts.astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ids = np.arange(total)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return ids - starts


def bsr_from_csr(A: sp.spmatrix, dtype=jnp.float32,
                 smooth_dtype=None) -> BsrMatrix:
    """Convert CSR to (8, 128)-block BSR (block-ELL across rows).
    smooth_dtype: also return a host-cast reduced-precision twin (see
    ell_from_csr)."""
    A = A.tocsr()
    n, m = A.shape
    n_br = pad_to(n) // 8
    n_bc = pad_to(m) // 128
    coo = A.tocoo()
    br = coo.row // 8
    bc = coo.col // 128
    # unique (block-row, block-col) pairs
    key = br.astype(np.int64) * n_bc + bc
    uniq, inv = np.unique(key, return_inverse=True)
    u_br = (uniq // n_bc).astype(np.int64)
    u_bc = (uniq % n_bc).astype(np.int64)
    blocks_per_row = np.bincount(u_br, minlength=n_br)
    W = max(1, int(blocks_per_row.max()))

    # slot of each unique block within its block-row
    order = np.argsort(u_br, kind="stable")
    slot = np.empty(uniq.size, dtype=np.int64)
    counts = np.bincount(u_br, minlength=n_br)
    starts = np.cumsum(counts) - counts
    slot[order] = np.arange(uniq.size) - starts[u_br[order]]

    blocks = np.zeros((n_br, W, 8, 128),
                      dtype=scatter_value_dtype(dtype, smooth_dtype))
    bcols = np.zeros((n_br, W), dtype=np.int32)
    bcols[u_br, slot] = u_bc
    blocks[u_br[inv], slot[inv], coo.row % 8, coo.col % 128] = coo.data
    M = BsrMatrix(
        blocks=to_device(blocks, dtype),
        bcols=jnp.asarray(bcols),
        shape=(n, m), nnz=int(A.nnz),
    )
    if smooth_dtype is None:
        return M
    return M, dataclasses.replace(M, blocks=to_device(blocks, smooth_dtype))


def bsr_block_width(rows: np.ndarray, cols: np.ndarray,
                    shape: tuple) -> tuple[int, int]:
    """(n_br, W): block-rows and max blocks per block-row of the (8, 128)
    blocking of the given coordinate pattern — the BSR footprint drivers.
    Standalone so the RCM decision can evaluate a PERMUTED pattern without
    materializing the permuted CSR."""
    n_br = pad_to(shape[0]) // 8
    n_bc = pad_to(shape[1]) // 128
    if rows.size == 0:
        return n_br, 1
    if n_br * n_bc <= 3 * 10**7:
        # flat-bincount occupancy: O(nnz + n_br*n_bc) with no CSR
        # build/dedup sort (the csr-constructor path was 1.2 s of the
        # 48^3 setup across the RCM compares); the dense grid gate keeps
        # the counts array bounded for multi-million-row operators
        key = (rows.astype(np.int64) // 8) * n_bc + cols // 128
        occ = np.bincount(key, minlength=n_br * n_bc) > 0
        W = max(1, int(occ.reshape(n_br, n_bc).sum(axis=1).max()))
        return n_br, W
    pat = sp.csr_matrix(
        (np.ones(rows.size, dtype=np.int8),
         (rows // 8, cols // 128)), shape=(n_br, n_bc))
    W = max(1, int(np.diff(pat.indptr).max()))
    return n_br, W


def bsr_bytes_estimate(A: sp.spmatrix, dtype=jnp.float32) -> int:
    """Storage the BSR conversion would need (for format selection).
    Block dedup via coo_tocsr's counting sort — O(nnz), not the
    O(nnz log nnz) np.unique sort. The (n_br, W) geometry is memoized on
    the matrix object: setup probes the same CSR from format selection,
    the RCM compare, and the picker dozens of times per level."""
    A = A.tocsr()
    key = (A.shape, A.nnz)
    tok = getattr(A, "_saena_bsr_geom", None)
    if tok is not None and tok[0] == key:
        n_br, W = tok[1]
    else:
        coo = A.tocoo()
        n_br, W = bsr_block_width(coo.row, coo.col, A.shape)
        try:
            A._saena_bsr_geom = (key, (n_br, W))
        except AttributeError:
            pass
    return n_br * W * 8 * 128 * jnp.dtype(dtype).itemsize


BSR_STREAM_BPS = 819e9       # v5e HBM stream rate the BSR kernel achieves
BSR_TIME_FACTOR = 1.3        # gather/launch overhead over the pure stream
                             # (A1: 67.8 MB -> 110 us measured vs 83 pure)
KERNEL_LAUNCH_S = 1.25e-6    # per-call launch/prolog floor, shared by ALL
                             # kernel time models (cancels in format
                             # ranking; keeps model_check honest on tiny
                             # coarse-level operators where it dominates —
                             # r5: L5 P+R measured 3.2 us vs 0.4 modeled)


def bsr_time_estimate(A: sp.spmatrix, dtype=jnp.float32) -> float:
    """Estimated matvec seconds: the BSR matvec is HBM-stream bound."""
    return KERNEL_LAUNCH_S + \
        bsr_bytes_estimate(A, dtype) / BSR_STREAM_BPS * BSR_TIME_FACTOR


def rcm_permutation(A: sp.spmatrix) -> np.ndarray:
    """Reverse Cuthill-McKee ordering for bandwidth reduction; applied to
    coarse operators at setup so block formats stay narrow (the reference
    is free to repartition/reorder at setup too — repart.cpp)."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(reverse_cuthill_mckee(A.tocsr(), symmetric_mode=True))


def dia_offsets_of(A: sp.spmatrix) -> np.ndarray:
    """Distinct diagonals, O(nnz + n) via bincount (offsets span
    [-(m-1), n-1] — small) instead of an O(nnz log nnz) unique sort."""
    coo = A.tocoo()
    if coo.row.size == 0:
        return np.zeros(0, dtype=np.int64)
    n, m = A.shape
    offs = coo.col.astype(np.int64) - coo.row + (n - 1)
    present = np.bincount(offs, minlength=n + m - 1) > 0
    return np.flatnonzero(present) - (n - 1)


def dia_from_csr(A: sp.spmatrix, dtype=jnp.float32,
                 smooth_dtype=None) -> DiaMatrix:
    """smooth_dtype: also return a host-cast reduced-precision twin sharing
    the offsets (values only — the Pallas kernel streams bf16 diagonals and
    accumulates f32, halving the smoother's dominant HBM term)."""
    coo = A.tocoo()
    n, m = A.shape
    if n != m:
        raise ValueError("DIA format requires a square matrix")
    offs = coo.col.astype(np.int64) - coo.row.astype(np.int64)
    uniq = np.unique(offs)
    n_pad = pad_to(n)
    data = np.zeros((uniq.size, n_pad), dtype=np.float64)
    k = np.searchsorted(uniq, offs)
    data[k, coo.row] = coo.data  # canonical CSR → no duplicate (k, row) pairs
    M = DiaMatrix(
        data=to_device(data, dtype),
        shape=(n, m),
        offsets=tuple(int(o) for o in uniq),
        nnz=int(A.nnz),
    )
    if smooth_dtype is None:
        return M
    return M, dataclasses.replace(M, data=to_device(data, smooth_dtype))


def dense_from_csr(A: sp.spmatrix, dtype=jnp.float32,
                   unit_diag_pad: bool = False,
                   smooth_dtype=None) -> DenseMatrix:
    n, m = A.shape
    n_pad, m_pad = pad_to(n), pad_to(m)
    d = np.zeros((n_pad, m_pad), dtype=np.float64)
    d[:n, :m] = np.asarray(A.todense())
    if unit_diag_pad and n_pad == m_pad:
        idx = np.arange(n, n_pad)
        d[idx, idx] = 1.0  # keep padded system nonsingular for LU
    M = DenseMatrix(data=to_device(d, dtype), shape=(n, m), nnz=int(A.nnz))
    if smooth_dtype is None:
        return M
    return M, DenseMatrix(data=to_device(d, smooth_dtype), shape=(n, m),
                          nnz=int(A.nnz))


def device_matrix_from_csr(
    A: sp.spmatrix,
    dtype=jnp.float32,
    dense_thre: float = 0.1,
    dense_sz_thre: int = 5000,
    switch_to_dense: bool = True,
    max_dia_diags: int = 40,
    dia_fill_thre: float = 0.3,
    prefer_bsr: Optional[bool] = None,
    bsr_max_bytes: int = 768 * 1024 * 1024,
    bsr_max_bytes_per_nnz: int = 1024,
    smooth_dtype=None,
) -> DeviceMatrix:
    """Pick the best device format for a matrix.

    Mirrors the reference's dense switch (density > dense_thre && Mbig <=
    dense_sz_thre, saena_object_setup2.cpp:327-339) and adds TPU-specific
    fast paths: DIA for stencil-structured matrices (gather-free, runs at
    HBM roofline) and (8,128)-block BSR for irregular mid-size operators
    where XLA's per-element HBM gather is ~50x off roofline. BSR trades
    memory for streaming bandwidth; it is taken when its footprint is
    bounded (bsr_max_bytes / bytes-per-nnz caps). prefer_bsr=None
    auto-selects BSR on TPU backends only — on CPU the scalar gather is
    cheap and ELL wins.

    smooth_dtype: when set, returns (M, M_smooth|None) — the reduced-
    precision twin is built from the SAME host arrays (no device astype,
    which would pay one remote XLA compile per level). DIA twins keep the
    Pallas fast path for bf16 data (f32 x/accumulator); dtypes the kernel
    cannot stream return None instead of silently degrading to the XLA
    lowering.
    """
    A = A.tocsr()
    n, m = A.shape
    density = A.nnz / max(1, n * m)

    def ret_dia(built):
        # keep the reduced twin only where the Pallas kernel streams it
        # (f32/bf16 data); an unsupported dtype would fall off the fast
        # path and make the "optimization" slower than f32
        if smooth_dtype is None:
            return built
        M, Msm = built
        from saena_tpu.ops.pallas_dia_spmv import dia_supported

        if jax.default_backend() == "tpu" and not dia_supported(
                M.offsets, M.n_pad, Msm.dtype):
            return M, None
        return M, Msm

    if switch_to_dense and density > dense_thre and max(n, m) <= dense_sz_thre:
        return dense_from_csr(A, dtype=dtype, smooth_dtype=smooth_dtype)
    if n == m and A.nnz > 0:
        offs = dia_offsets_of(A)
        fill = A.nnz / (offs.size * n)
        if offs.size <= max_dia_diags and fill >= dia_fill_thre:
            return ret_dia(dia_from_csr(A, dtype=dtype,
                                        smooth_dtype=smooth_dtype))
        # wide-stencil DIA: Galerkin coarse operators of grid problems keep
        # ~100 diagonals at high fill — the Pallas kernel streams that at
        # HBM rate (12x the strip-gather kernel measured on the 48^3
        # Poisson level 1), so take DIA far past the XLA path's diag cap
        if fill >= dia_fill_thre and offs.size <= 256:
            from saena_tpu.ops.pallas_dia_spmv import dia_supported

            if jax.default_backend() == "tpu" and \
                    dia_supported(tuple(int(o) for o in offs), pad_to(n),
                                  dtype):
                return ret_dia(dia_from_csr(A, dtype=dtype,
                                            smooth_dtype=smooth_dtype))
    if prefer_bsr is None:
        prefer_bsr = jax.default_backend() not in ("cpu",)
    if prefer_bsr and A.nnz > 0:
        builder = pick_gather_format(A, dtype, max_bytes=bsr_max_bytes,
                                     max_bytes_per_nnz=bsr_max_bytes_per_nnz)
        if builder is not None:
            return builder(A, dtype=dtype, smooth_dtype=smooth_dtype)
    return ell_from_csr(A, dtype=dtype, width_quantile=0.98,
                        smooth_dtype=smooth_dtype)


def gather_time_estimate(A: sp.spmatrix, dtype=jnp.float32,
                         max_bytes: int = 768 * 1024 * 1024,
                         max_bytes_per_nnz: int = 1024) -> float:
    """min estimated matvec seconds over the applicable gather formats
    (strip, strip8, BSR) for an irregular operator; inf if none fits."""
    t, _ = _pick_gather(A, dtype, max_bytes, max_bytes_per_nnz)
    return t


def gather_time_estimate_quick(A: sp.spmatrix, dtype=jnp.float32) -> float:
    """Cheap upper-ish gather estimate: the SAMPLED strip pick plus the
    memoized BSR stream model, skipping strip8's full-pattern plan (the
    strip8 planner walks every nonzero — paying it for an operator that a
    cheaper candidate already beats is the waste this gates). Callers use
    it only to decide whether the exact probe is worth running, with a
    safety margin covering strip8's best observed advantage (~3x)."""
    from saena_tpu.ops.pallas_strip_spmv import (
        strip_supported, strip_time_estimate)

    t = bsr_time_estimate(A, dtype)
    if A.nnz >= 4096 and strip_supported(A, dtype):
        t = min(t, strip_time_estimate(A, dtype))
    return t


def pick_gather_format(A: sp.spmatrix, dtype=jnp.float32,
                       max_bytes: int = 768 * 1024 * 1024,
                       max_bytes_per_nnz: int = 1024):
    """Builder (fn(A, dtype=, smooth_dtype=)) for the fastest applicable
    gather format by ESTIMATED MATVEC TIME, or None. Bytes caps bound the
    device footprint; the choice itself is time-based — the strip kernels
    are VPU-op bound, BSR is stream bound, so bytes alone mis-rank them
    (measured: SA level-1 A is 26 us strip8 / 48 us strip / 110 us BSR
    while BSR streams the most bytes; a near-diagonal transfer operator
    reverses strip vs strip8)."""
    _, builder = _pick_gather(A, dtype, max_bytes, max_bytes_per_nnz)
    return builder


STRIP_X_VMEM = 4 * 1024 * 1024   # the strip kernels' x-strips VMEM budget


def _colpanel_bounds(m: int, itemsize: int):
    """128-aligned column-panel bounds so each panel's x strips fit the
    strip kernels' VMEM budget (half-budget panels leave tile headroom);
    None when x already fits in one window."""
    isz = max(4, itemsize)        # x strips stay >= f32 in-kernel
    if pad_to(m) * isz <= STRIP_X_VMEM:
        return None
    W = (STRIP_X_VMEM // 2 // isz // PAD) * PAD
    return list(range(0, m, W)) + [m]


def _colpanel_parts(A: sp.spmatrix, itemsize: int):
    """Column slices with nnz (memoized on the CALLER's matrix object so
    estimate and build share one split), or None."""
    key = (A.shape, A.nnz, itemsize)
    tok = getattr(A, "_saena_colpanels", None)
    if tok is not None and tok[0] == key:
        return tok[1]
    bounds = _colpanel_bounds(A.shape[1], itemsize)
    res = None
    if bounds is not None:
        Ac = A.tocsc()
        res = []
        for c0, c1 in zip(bounds, bounds[1:]):
            p = Ac[:, c0:c1].tocsr()
            if p.nnz:
                res.append((c0, p))
        res = tuple(res)
    try:
        A._saena_colpanels = (key, res)
    except AttributeError:
        pass
    return res


def colpanels_from_csr(A: sp.spmatrix, dtype=jnp.float32, _builders=None,
                       smooth_dtype=None):
    """Build the column-panelled composite; each panel gets the fastest
    gather format for its own column range.

    When the caller came through ``_colpanel_pick`` (format selection), the
    per-panel builder choices made UNDER THE CALLER'S BYTE CAPS arrive via
    ``_builders`` (bound into the returned partial), so estimate and build
    never diverge — including across picks made under DIFFERENT caps for
    the same matrix (ADVICE r3/r4: an on-matrix memo keyed without the caps
    could be overwritten by a later pick)."""
    isz = jnp.dtype(dtype).itemsize
    parts = _colpanel_parts(A, isz)
    n, m = A.shape
    m_pad = pad_to(m)
    builders = _builders
    built, starts, widths = [], [], []
    for i, (c0, p) in enumerate(parts):
        if builders is not None:
            b = builders[i]
        else:
            _, b = _pick_gather(p, dtype, 768 * 1024 * 1024, 1024)
        if b is None:
            b = partial(ell_from_csr, width_quantile=0.98)
        built.append(b(p, dtype=dtype, smooth_dtype=smooth_dtype))
        starts.append(c0)
        widths.append(min(pad_to(p.shape[1]), m_pad - c0))
    mk = lambda ps: ColPanels(parts=tuple(ps), col_starts=tuple(starts),
                              col_widths=tuple(widths), shape=(n, m),
                              nnz=int(A.nnz))
    if smooth_dtype is None:
        return mk(built)
    return mk([b for b, _ in built]), mk([s for _, s in built])


def _builder_bytes(p, dtype, builder) -> int:
    """Device-footprint estimate for a panel under a chosen builder."""
    from saena_tpu.ops.pallas_strip8_spmv import (
        strip8_bytes_estimate, strip8_from_csr,
        strip8_panels_bytes_estimate, strip8_panels_from_csr)
    from saena_tpu.ops.pallas_strip_spmv import (
        strip_bytes_estimate, strip_from_csr)

    if builder is bsr_from_csr:
        return bsr_bytes_estimate(p, dtype)
    if builder is strip_from_csr:
        return strip_bytes_estimate(p, dtype)
    if builder is strip8_from_csr:
        return strip8_bytes_estimate(p, dtype)
    if builder is strip8_panels_from_csr:
        return strip8_panels_bytes_estimate(p, dtype)
    return 0


def _colpanel_pick(A, dtype, max_bytes, max_bytes_per_nnz):
    """(time, builder) for the column-panelled candidate, or (inf, None).
    Per-panel builder choices are memoized on the matrix so
    colpanels_from_csr builds EXACTLY what was estimated (ADVICE r3)."""
    isz = jnp.dtype(dtype).itemsize
    parts = _colpanel_parts(A, isz)
    if parts is None or len(parts) < 2:
        return float("inf"), None
    total_t, total_b = 0.0, 0
    builders = []
    for _, p in parts:
        t, b = _pick_gather(p, dtype, max_bytes, max_bytes_per_nnz)
        if b is None:
            return float("inf"), None
        total_t += t + 2e-6          # per-extra-call launch overhead
        total_b += _builder_bytes(p, dtype, b)
        builders.append(b)
    cap = min(max_bytes, max_bytes_per_nnz * max(1, A.nnz))
    if total_b > cap:
        return float("inf"), None
    return total_t, partial(colpanels_from_csr, _builders=tuple(builders))


def _pick_gather(A, dtype, max_bytes, max_bytes_per_nnz):
    from saena_tpu.ops.pallas_strip8_spmv import (
        strip8_bytes_estimate, strip8_from_csr, strip8_supported,
        strip8_time_estimate)
    from saena_tpu.ops.pallas_strip_spmv import (
        strip_bytes_estimate, strip_from_csr, strip_supported,
        strip_time_estimate)

    A = A.tocsr()
    cap = min(max_bytes, max_bytes_per_nnz * max(1, A.nnz))
    best = (float("inf"), None)
    if A.nnz >= 4096:
        if strip_supported(A, dtype) and \
                strip_bytes_estimate(A, dtype) <= cap:
            ts = strip_time_estimate(A, dtype)
            if ts < best[0]:
                best = (ts, strip_from_csr)
        if strip8_supported(A, dtype) and \
                strip8_bytes_estimate(A, dtype) <= cap:
            t8 = strip8_time_estimate(A, dtype)
            if t8 < best[0]:
                best = (t8, strip8_from_csr)
        elif not strip8_supported(A, dtype):
            # SMEM-gated at full size (big mid-level operators): row
            # panels split the per-call prefetch; x stays shared
            from saena_tpu.ops.pallas_strip8_spmv import (
                strip8_panel_slices, strip8_panels_bytes_estimate,
                strip8_panels_from_csr, strip8_panels_time_estimate)

            if strip8_panel_slices(A, dtype) is not None and \
                    strip8_panels_bytes_estimate(A, dtype) <= cap:
                t8p = strip8_panels_time_estimate(A, dtype)
                if t8p < best[0]:
                    best = (t8p, strip8_panels_from_csr)
    if bsr_bytes_estimate(A, dtype) <= cap:
        tb = bsr_time_estimate(A, dtype)
        if tb < best[0]:
            best = (tb, bsr_from_csr)
    # wide-x operators (restriction at multi-million-row fine levels):
    # column panels bring x back under the strip kernels' VMEM budget
    if A.nnz >= 4096 and \
            pad_to(A.shape[1]) * max(4, jnp.dtype(dtype).itemsize) \
            > STRIP_X_VMEM:
        tc, bc = _colpanel_pick(A, dtype, max_bytes, max_bytes_per_nnz)
        if tc < best[0]:
            best = (tc, bc)
    return best
