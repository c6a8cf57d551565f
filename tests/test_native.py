"""Native GR codec (GR_encoder parity) — roundtrip + compression ratio."""
import numpy as np
import pytest

from saena_tpu._native import (
    delta_decode,
    delta_encode,
    gr_compress,
    gr_decompress,
    gr_pick_k,
    have_native,
)


def test_native_builds():
    # g++ is in the image; the native path must be live (fallback is only
    # for toolchain-less installs)
    assert have_native()


@pytest.mark.parametrize("k", [0, 7, 15])
def test_roundtrip_small(k):
    v = np.array([0, 1, 2, 127, 128, 255, 1000, 2**20, 5], dtype=np.uint32)
    payload, k_used = gr_compress(v, k)
    out = gr_decompress(payload, v.size, k_used)
    np.testing.assert_array_equal(out, v)


def test_roundtrip_random():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 300, size=10000).astype(np.uint32)
    payload, k = gr_compress(v)
    out = gr_decompress(payload, v.size, k)
    np.testing.assert_array_equal(out, v)
    # small deltas must compress well below 4 B/value
    assert len(payload) < 2 * v.size


def test_pick_k_small_values():
    v = np.zeros(1000, dtype=np.uint32)
    assert gr_pick_k(v) == 0
    v = np.full(1000, 100, dtype=np.uint32)
    assert gr_pick_k(v) == 7


def test_delta_roundtrip():
    rng = np.random.default_rng(1)
    # two sorted segments (like per-column CSC row streams)
    a = np.sort(rng.integers(0, 10000, 500)).astype(np.uint32)
    b = np.sort(rng.integers(0, 10000, 300)).astype(np.uint32)
    v = np.concatenate([a, b])
    seg = np.array([0, 500], dtype=np.int64)
    d = delta_encode(v, seg)
    out = delta_decode(d, seg)
    np.testing.assert_array_equal(out, v)


def test_csr_index_stream_compression():
    """End-to-end: compress a real matrix's column stream (the reference
    compresses CSC row streams before the SpGEMM ring)."""
    from saena_tpu.generators import laplacian3D

    A = laplacian3D(12, 12, 12).tocsr()
    cols = A.indices.astype(np.uint32)
    seg = A.indptr[:-1].astype(np.int64)
    d = delta_encode(cols, seg)
    payload, k = gr_compress(d)
    ratio = len(payload) / (4 * cols.size)
    assert ratio < 0.5  # beats raw int32 by >2x on stencil streams
    out = delta_decode(gr_decompress(payload, cols.size, k), seg)
    np.testing.assert_array_equal(out, cols)


def test_spgemm_csr_matches_scipy():
    """Native Gustavson SpGEMM == scipy (canonical CSR), incl. duplicate
    accumulation, empty rows, rectangular shapes, and the dense-emit path."""
    import scipy.sparse as sp
    from saena_tpu._native import spgemm_csr

    rng = np.random.default_rng(42)
    for density in (0.02, 0.3, 0.9):
        n, k, m = rng.integers(1, 300, size=3)
        A = sp.random(n, k, density=density, random_state=rng, format="csr")
        B = sp.random(k, m, density=density, random_state=rng, format="csr")
        C = spgemm_csr(A, B)
        Cref = (A @ B).tocsr()
        Cref.sum_duplicates()
        Cref.sort_indices()
        np.testing.assert_array_equal(C.indptr, Cref.indptr)
        np.testing.assert_array_equal(C.indices, Cref.indices)
        np.testing.assert_allclose(C.data, Cref.data, rtol=1e-13)
    # all-empty operands
    Z = spgemm_csr(sp.csr_matrix((5, 7)), sp.csr_matrix((7, 3)))
    assert Z.shape == (5, 3) and Z.nnz == 0
