"""Native (C++) components, built lazily with g++ and loaded via ctypes.

The reference links MKL/SuperLU/zfp/usort for its native needs; the TPU
rebuild keeps the compute path in XLA/Pallas but implements host-side
runtime pieces natively where the reference did: the Golomb-Rice index-
stream codec (GR_encoder parity) lives here. A pure-numpy fallback covers
environments without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    # libgomp's default wait policy spin-waits after every parallel region;
    # on small-core hosts the spinning sibling steals a hyperthread from the
    # serial numpy work BETWEEN kernel calls (measured 6x on the Lanczos
    # loop: 0.82 s -> 0.13 s per 48^3 eig estimate). Must be set before
    # libgomp initializes; harmless no-op if something loaded it already.
    os.environ.setdefault("OMP_WAIT_POLICY", "passive")
    srcs = [os.path.join(_HERE, "gr_codec.cpp"),
            os.path.join(_HERE, "mis1.cpp"),
            os.path.join(_HERE, "spgemm.cpp"),
            os.path.join(_HERE, "stripplan.cpp"),
            os.path.join(_HERE, "strip8plan.cpp"),
            os.path.join(_HERE, "strength.cpp")]
    so = os.path.join(_HERE, "libsaena_native.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < max(map(os.path.getmtime, srcs))):
            # -ffp-contract=off: no silent FMA fusion — the SpGEMM/SpMV
            # kernels must produce the same floating-point results as the
            # scipy/torch paths they replace (convergence goldens pin
            # iteration counts to the bit)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-ffp-contract=off",
                 "-fopenmp", "-shared",
                 "-fPIC", "-std=c++17", *srcs, "-o", so + ".tmp"],
                check=True, capture_output=True)
            os.replace(so + ".tmp", so)
        lib = ctypes.CDLL(so)
        lib.gr_compress.restype = ctypes.c_int64
        lib.gr_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64]
        lib.gr_decompress.restype = ctypes.c_int64
        lib.gr_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64]
        lib.gr_pick_k.restype = ctypes.c_int
        lib.gr_pick_k.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.delta_encode.restype = None
        lib.delta_encode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_void_p]
        lib.delta_decode.restype = None
        lib.delta_decode.argtypes = lib.delta_encode.argtypes
        lib.mis1_aggregate.restype = None
        lib.mis1_aggregate.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.mis1_sweep.restype = ctypes.c_int64
        lib.mis1_sweep.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.spgemm_csr_start.restype = ctypes.c_void_p
        lib.spgemm_csr_start.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
        lib.spgemm_csr_finish.restype = None
        lib.spgemm_csr_finish.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.strip_plan_core.restype = ctypes.c_int64
        lib.strip_plan_core.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.strip8_plan_core.restype = ctypes.c_int64
        lib.strip8_plan_core.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.strip8i_plan_core.restype = ctypes.c_int64
        lib.strip8i_plan_core.argtypes = lib.strip8_plan_core.argtypes
        lib.strength_keep.restype = ctypes.c_int64
        lib.strength_keep.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_double, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.csr_matvec.restype = None
        lib.csr_matvec.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def have_native() -> bool:
    return _build_and_load() is not None


QMAX = 48


def gr_pick_k(values: np.ndarray) -> int:
    """Best k among {0, 7, 15} (ref CSCMat::compress_prep picks per-rank k)."""
    values = np.ascontiguousarray(values, dtype=np.uint32)
    lib = _build_and_load()
    if lib is not None:
        return int(lib.gr_pick_k(values.ctypes.data, values.size))
    best_k, best_bits = 7, np.inf
    for k in (0, 7, 15):
        q = values >> k
        bits = np.where(q < QMAX, q + 1 + k, QMAX + 32).sum()
        if bits < best_bits:
            best_bits, best_k = bits, k
    return best_k


def gr_compress(values: np.ndarray, k: int | None = None) -> tuple[bytes, int]:
    """Golomb-Rice compress a uint32 stream; returns (payload, k)."""
    values = np.ascontiguousarray(values, dtype=np.uint32)
    if k is None:
        k = gr_pick_k(values)
    lib = _build_and_load()
    if lib is not None:
        cap = int(values.size * 12 + 64)
        out = np.zeros(cap, dtype=np.uint8)
        n = lib.gr_compress(values.ctypes.data, values.size, k,
                            out.ctypes.data, cap)
        if n < 0:
            raise RuntimeError(f"gr_compress failed ({n})")
        return bytes(out[:n].tobytes()), k
    return _py_gr_compress(values, k), k


def gr_decompress(payload: bytes, n_vals: int, k: int) -> np.ndarray:
    lib = _build_and_load()
    buf = np.frombuffer(payload, dtype=np.uint8)
    out = np.zeros(n_vals, dtype=np.uint32)
    if lib is not None:
        r = lib.gr_decompress(buf.ctypes.data, buf.size, k,
                              out.ctypes.data, n_vals)
        if r < 0:
            raise RuntimeError("gr_decompress: malformed stream")
        return out
    return _py_gr_decompress(buf, n_vals, k)


def delta_encode(values: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    values = np.ascontiguousarray(values, dtype=np.uint32)
    seg = np.ascontiguousarray(seg_starts, dtype=np.int64)
    lib = _build_and_load()
    out = np.zeros_like(values)
    if lib is not None and values.size:
        lib.delta_encode(values.ctypes.data, values.size,
                         seg.ctypes.data, seg.size, out.ctypes.data)
        return out
    prev = np.concatenate([[0], values[:-1]]) if values.size else values
    out = values - prev
    out[seg[seg < values.size]] = values[seg[seg < values.size]]
    return out


def delta_decode(deltas: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    deltas = np.ascontiguousarray(deltas, dtype=np.uint32)
    seg = np.ascontiguousarray(seg_starts, dtype=np.int64)
    lib = _build_and_load()
    out = np.zeros_like(deltas)
    if lib is not None and deltas.size:
        lib.delta_decode(deltas.ctypes.data, deltas.size,
                         seg.ctypes.data, seg.size, out.ctypes.data)
        return out
    out = deltas.copy()
    starts = seg[seg < deltas.size]
    grp = np.zeros(deltas.size, dtype=np.int64)
    grp[starts] = 1
    grp = np.cumsum(grp)
    csum = np.cumsum(deltas.astype(np.uint64))
    base = np.zeros(deltas.size, dtype=np.uint64)
    if starts.size:
        base_vals = csum[starts] - deltas[starts]
        base = base_vals[grp - 1]
    return (csum - base).astype(np.uint32)


def mis1_aggregate(indptr: np.ndarray, indices: np.ndarray):
    """Single-pass lexicographic-first MIS(1) aggregation (mis1.cpp).

    Returns (agg, is_root) with agg[i] = fine index of i's root — identical
    to the vectorized min-index fixpoint in amg/strength.py (which reproduces
    the reference's aggregation_1_dist), in one O(nnz) sweep instead of
    O(wavefront-depth) rounds. Returns None when no native toolchain exists;
    the caller falls back to the fixpoint.
    """
    lib = _build_and_load()
    if lib is None:
        return None
    n = indptr.size - 1
    # mis1.cpp walks int32 column indices; narrowing a >=2^31 index would
    # silently wrap, so route such (pathological) graphs to the fixpoint
    if n >= 2**31 or (indices.size and int(indices.max()) >= 2**31):
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    agg = np.empty(n, dtype=np.int64)
    is_root = np.empty(n, dtype=np.uint8)
    lib.mis1_aggregate(n, indptr.ctypes.data, indices.ctypes.data,
                       agg.ctypes.data, is_root.ctypes.data)
    return agg, is_root


def mis1_sweep(row0: int, indptr, indices, dec_snap, root_snap,
               decided, is_root, agg) -> int | None:
    """One per-shard round of the distributed MIS fixpoint (mis1.cpp):
    ascending-index local sweep, fresh local state + snapshot remote state.
    Mutates decided/is_root/agg in the shard's global slice; returns the
    number of still-undecided local rows, or None without a toolchain.
    Callers must pass contiguous arrays of the declared dtypes."""
    lib = _build_and_load()
    if lib is None:
        return None
    n_loc = indptr.size - 1
    return int(lib.mis1_sweep(
        n_loc, row0, indptr.ctypes.data, indices.ctypes.data,
        dec_snap.ctypes.data, root_snap.ctypes.data,
        decided.ctypes.data, is_root.ctypes.data, agg.ctypes.data))


def strip_plan_core(row, col, rpt: int, n_strips: int, perrow: int):
    """Native slot/pair assignment for the strip-gather planner
    (stripplan.cpp). Entries must be sorted by (row, col) — canonical CSR
    order. Returns (slot int8, inv int32, pair_rb int32, pair_strip int32)
    with the pair arrays truncated to the unique-pair count, or None when
    no toolchain exists / inputs are unsorted or too wide (the numpy
    planner handles those)."""
    lib = _build_and_load()
    if lib is None:
        return None
    nnz = row.size
    row = np.ascontiguousarray(row, dtype=np.int64)
    col = np.ascontiguousarray(col, dtype=np.int64)
    slot = np.empty(nnz, dtype=np.int8)
    inv = np.empty(nnz, dtype=np.int32)
    pair_rb = np.empty(nnz, dtype=np.int32)
    pair_strip = np.empty(nnz, dtype=np.int32)
    n_pairs = lib.strip_plan_core(
        nnz, row.ctypes.data, col.ctypes.data, rpt, n_strips, perrow,
        slot.ctypes.data, inv.ctypes.data, pair_rb.ctypes.data,
        pair_strip.ctypes.data)
    if n_pairs < 0:
        return None
    return slot, inv, pair_rb[:n_pairs].copy(), pair_strip[:n_pairs].copy()


def strip8_plan_core(row, col, n_rb: int, n_strips: int, perrow: int = 1):
    """Native multi-strip tile assignment (strip8plan.cpp). Entries must be
    sorted by (row, col). Returns (e_tile int32, e_sub int8, e_krem int8,
    tile_strips (n_tiles, 8) int32, rb_tiles int32) or None when no
    toolchain / unsorted input."""
    lib = _build_and_load()
    if lib is None:
        return None
    nnz = row.size
    row = np.ascontiguousarray(row, dtype=np.int64)
    col = np.ascontiguousarray(col, dtype=np.int64)
    cap = nnz // 8 + n_rb + 2
    e_tile = np.empty(nnz, dtype=np.int32)
    e_sub = np.empty(nnz, dtype=np.int8)
    e_krem = np.empty(nnz, dtype=np.int8)
    t_strip = np.empty(cap * 8, dtype=np.int32)
    rb_tiles = np.zeros(n_rb, dtype=np.int32)
    n_tiles = lib.strip8_plan_core(
        nnz, row.ctypes.data, col.ctypes.data, n_rb, n_strips, perrow,
        e_tile.ctypes.data, e_sub.ctypes.data, e_krem.ctypes.data,
        t_strip.ctypes.data, rb_tiles.ctypes.data, cap)
    if n_tiles < 0:
        return None
    return (e_tile, e_sub, e_krem,
            t_strip[:n_tiles * 8].reshape(n_tiles, 8).copy(), rb_tiles)


def strip8i_plan_core(row, col, n_rb: int, n_strips: int, perrow: int = 1):
    """Interval variant of strip8_plan_core (strip8plan.cpp): each tile's 8
    strip slots are a consecutive range starting at t_base[tile]. Returns
    (e_tile int32, e_sub int8, e_krem int8, t_base (n_tiles,) int32,
    rb_tiles int32) or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    nnz = row.size
    row = np.ascontiguousarray(row, dtype=np.int64)
    col = np.ascontiguousarray(col, dtype=np.int64)
    # tiles <= nnz (sum over strips of max-per-row counts) + 1 per interval
    cap = nnz + 8 * n_rb + 16
    e_tile = np.empty(nnz, dtype=np.int32)
    e_sub = np.empty(nnz, dtype=np.int8)
    e_krem = np.empty(nnz, dtype=np.int8)
    t_base = np.empty(cap, dtype=np.int32)
    rb_tiles = np.zeros(n_rb, dtype=np.int32)
    n_tiles = lib.strip8i_plan_core(
        nnz, row.ctypes.data, col.ctypes.data, n_rb, n_strips, perrow,
        e_tile.ctypes.data, e_sub.ctypes.data, e_krem.ctypes.data,
        t_base.ctypes.data, rb_tiles.ctypes.data, cap)
    if n_tiles < 0:
        return None
    return e_tile, e_sub, e_krem, t_base[:n_tiles].copy(), rb_tiles


def strength_keep(indptr, indices, data, theta: float):
    """Native strength-graph keep mask (strength.cpp): per-row max of
    -offdiag + union-symmetrized threshold test, bit-identical to the numpy
    path in amg/strength.py. Returns (keep uint8, kept count) or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    n = indptr.size - 1
    if n >= 2**31 or (indices.size and indices.dtype.itemsize > 4
                      and indices.max() >= 2**31):
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float64)
    keep = np.empty(indices.size, dtype=np.uint8)
    safe = np.empty(n, dtype=np.float64)
    kept = lib.strength_keep(n, indptr.ctypes.data, indices.ctypes.data,
                             data.ctypes.data, float(theta),
                             keep.ctypes.data, safe.ctypes.data)
    return keep.view(bool), int(kept)


def csr_matvec(indptr, indices, data, x, out=None):
    """Native y = A x with scipy-identical per-row sequential accumulation
    (strength.cpp). Returns None when no toolchain exists."""
    lib = _build_and_load()
    if lib is None:
        return None
    n = indptr.size - 1
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float64)
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = out if out is not None else np.empty(n, dtype=np.float64)
    lib.csr_matvec(n, indptr.ctypes.data, indices.ctypes.data,
                   data.ctypes.data, x.ctypes.data, y.ctypes.data)
    return y


def spgemm_csr(A, B, nt: int = 0):
    """Native CSR x CSR product (spgemm.cpp): Gustavson with a stamped dense
    accumulator, OpenMP threads over FLOP-balanced contiguous row blocks.
    Returns a canonical scipy CSR (sorted indices, no duplicates), or None
    when no toolchain / the operands exceed int32 column indexing.
    ``nt``: thread count (0 = OpenMP default); pass 1 from callers that
    already run shard tasks in parallel (no core oversubscription).

    The host stand-in for the reference's mkl_dcsrmultcsr fast_mm base case
    (saena_object_setup_matmat.cpp:214); measured ~2-3x over torch-MKL and
    scipy on the 48^3 Poisson Galerkin levels."""
    import scipy.sparse as sp

    lib = _build_and_load()
    if lib is None:
        return None
    n, k = A.shape
    k2, m = B.shape
    assert k == k2, (A.shape, B.shape)
    if max(n, m, k) >= 2**31:
        return None
    a_indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
    a_indices = np.ascontiguousarray(A.indices, dtype=np.int32)
    a_values = np.ascontiguousarray(A.data, dtype=np.float64)
    b_indptr = np.ascontiguousarray(B.indptr, dtype=np.int64)
    b_indices = np.ascontiguousarray(B.indices, dtype=np.int32)
    b_values = np.ascontiguousarray(B.data, dtype=np.float64)
    rownnz = np.zeros(n, dtype=np.int64)
    nnz_out = ctypes.c_int64(0)
    ctx = lib.spgemm_csr_start(
        n, m,
        a_indptr.ctypes.data, a_indices.ctypes.data, a_values.ctypes.data,
        b_indptr.ctypes.data, b_indices.ctypes.data, b_values.ctypes.data,
        rownnz.ctypes.data, ctypes.byref(nnz_out), int(nt))
    nnz = int(nnz_out.value)
    c_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(rownnz, out=c_indptr[1:])
    c_indices = np.empty(nnz, dtype=np.int32)
    c_values = np.empty(nnz, dtype=np.float64)
    lib.spgemm_csr_finish(ctx, c_indptr.ctypes.data,
                          c_indices.ctypes.data, c_values.ctypes.data)
    out = sp.csr_matrix((c_values, c_indices, c_indptr), shape=(n, m))
    out.has_sorted_indices = True
    out.has_canonical_format = True
    return out


# ---- pure-python bitstream fallback (slow; only used without g++) ----

def _py_gr_compress(values: np.ndarray, k: int) -> bytes:
    bits = []
    mask = (1 << k) - 1
    for v in values.tolist():
        q = v >> k
        if q < QMAX:
            bits.extend([1] * q)
            bits.append(0)
            for i in range(k):
                bits.append((v >> i) & 1)
        else:
            bits.extend([1] * QMAX)
            for i in range(32):
                bits.append((v >> i) & 1)
    arr = np.asarray(bits + [0] * ((-len(bits)) % 8), dtype=np.uint8)
    return np.packbits(arr.reshape(-1, 8)[:, ::-1], axis=1).tobytes()


def _py_gr_decompress(buf: np.ndarray, n_vals: int, k: int) -> np.ndarray:
    bits = np.unpackbits(buf)[: buf.size * 8]
    bits = bits.reshape(-1, 8)[:, ::-1].ravel()
    out = np.zeros(n_vals, dtype=np.uint32)
    pos = 0
    for i in range(n_vals):
        q = 0
        while q < QMAX and bits[pos]:
            q += 1
            pos += 1
        if q == QMAX:
            v = 0
            for j in range(32):
                v |= int(bits[pos + j]) << j
            pos += 32
        else:
            pos += 1  # the 0 terminator
            v = 0
            for j in range(k):
                v |= int(bits[pos + j]) << j
            pos += k
            v |= q << k
        out[i] = v
    return out
