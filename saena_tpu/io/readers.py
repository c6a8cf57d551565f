"""Matrix file I/O.

The reference reads Matrix Market ``.mtx`` files and its own ``.bin`` format
(packed little-endian (int32 row, int32 col, float64 val) triples with both
triangles stored — saena_matrix.cpp:17-401 does the .mtx→.bin conversion and
a parallel binary read). Here both land in scipy CSR on the host; sharding
happens later at setup.
"""
from __future__ import annotations

import os

import numpy as np
import scipy.io
import scipy.sparse as sp

_BIN_DTYPE = np.dtype([("row", "<i4"), ("col", "<i4"), ("val", "<f8")])


def read_bin(path: str, shape=None) -> sp.csr_matrix:
    """Read Saena .bin COO triples (0-based, both triangles present)."""
    raw = np.fromfile(path, dtype=_BIN_DTYPE)
    rows = raw["row"].astype(np.int64)
    cols = raw["col"].astype(np.int64)
    if shape is None:
        n = int(max(rows.max(), cols.max())) + 1 if rows.size else 0
        shape = (n, n)
    a = sp.csr_matrix((raw["val"], (rows, cols)), shape=shape)
    a.sum_duplicates()
    return a


def write_bin(path: str, A: sp.spmatrix) -> None:
    coo = A.tocoo()
    order = np.lexsort((coo.row, coo.col))  # column-major like the reference
    out = np.empty(coo.nnz, dtype=_BIN_DTYPE)
    out["row"] = coo.row[order]
    out["col"] = coo.col[order]
    out["val"] = coo.data[order]
    out.tofile(path)


def read_mtx(path: str) -> sp.csr_matrix:
    a = scipy.io.mmread(path).tocsr()
    a.sum_duplicates()
    return a


def write_mtx(path: str, A: sp.spmatrix) -> None:
    scipy.io.mmwrite(path, A.tocoo())


def read_matrix(path: str) -> sp.csr_matrix:
    """Dispatch on extension, like the reference's read_file auto-detect."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".bin":
        return read_bin(path)
    if ext in (".mtx", ".mm"):
        return read_mtx(path)
    raise ValueError(f"unsupported matrix file extension: {ext!r}")
