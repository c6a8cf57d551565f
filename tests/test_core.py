"""COO assembly semantics, boundary removal, generators, io."""
import os

import numpy as np
import pytest
import scipy.sparse as sp

from saena_tpu.core.coo import CooBuilder, remove_boundary_nodes
from saena_tpu.generators import (
    band_matrix,
    laplacian2D,
    laplacian3D,
    laplacian3D_set_rhs,
    laplacian3D_solution,
    random_symm_matrix,
)
from saena_tpu.io.readers import read_bin, read_mtx, write_bin, write_mtx

REF_DATA = "/root/reference/data"


def test_set_replace_semantics():
    b = CooBuilder(add_duplicates=False)
    b.set(0, 0, 1.0)
    b.set(0, 0, 5.0)  # replaces
    b.set(1, 1, 2.0)
    A = b.assemble()
    assert A[0, 0] == 5.0 and A[1, 1] == 2.0 and A.nnz == 2


def test_set2_add_semantics():
    b = CooBuilder(add_duplicates=True)
    b.set([0, 0, 1], [0, 0, 1], [1.0, 5.0, 2.0])
    A = b.assemble()
    assert A[0, 0] == 6.0 and A.nnz == 2


def test_almost_zero_dropped():
    b = CooBuilder()
    b.set([0, 1], [0, 1], [1e-20, 1.0])
    assert b.assemble().nnz == 1


def test_boundary_removal():
    A = laplacian3D(6, 6, 6)
    rhs = laplacian3D_set_rhs(6, 6, 6)
    Ai, interior, bound, bdiag, rhs_i = remove_boundary_nodes(A, rhs)
    assert bound.size == 6**3 - 4**3
    assert Ai.shape[0] == 4**3
    np.testing.assert_allclose(bdiag, 1.0)
    # interior matrix keeps the stencil diagonal
    assert (Ai.diagonal() > 0).all()


def test_laplacian_symmetry():
    for A in (laplacian2D(9, 9), laplacian3D(7, 6, 5)):
        d = (A - A.T)
        assert d.nnz == 0


def test_laplacian3d_manufactured():
    # interior consistency: A u_exact ~ rhs up to discretization error
    m = 24
    A = laplacian3D(m, m, m)
    u = laplacian3D_solution(m, m, m)
    r = laplacian3D_set_rhs(m, m, m)
    k, j, i = np.meshgrid(*(np.arange(m),) * 3, indexing="ij")
    inter = ((i > 0) & (i < m - 1) & (j > 0) & (j < m - 1) & (k > 0) & (k < m - 1)).ravel()
    err = (A @ u - r)[inter]
    # relative discretization error is O(h^2)
    assert np.abs(err).max() / np.abs(r[inter]).max() < 0.05


def test_band_matrix_values():
    A = band_matrix(50, 3).tocoo()
    for r, c, v in zip(A.row, A.col, A.data):
        assert abs(r - c) <= 3
        np.testing.assert_allclose(v, 1.0 / (r + c + 1))
    assert ((band_matrix(50, 3) - band_matrix(50, 3).T).nnz) == 0


def test_random_symm():
    A = random_symm_matrix(100, 0.05, seed=7)
    assert (A - A.T).nnz == 0
    assert (A.diagonal() != 0).all()


def test_bin_roundtrip(tmp_path):
    A = random_symm_matrix(60, 0.1, seed=8)
    p = str(tmp_path / "m.bin")
    write_bin(p, A)
    B = read_bin(p)
    assert (A - B).nnz == 0


def test_mtx_roundtrip(tmp_path):
    A = random_symm_matrix(60, 0.1, seed=9)
    p = str(tmp_path / "m.mtx")
    write_mtx(p, A)
    B = read_mtx(p)
    np.testing.assert_allclose(np.abs(A - B).max(), 0, atol=1e-12)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_reference_bin_matches_mtx():
    """The bundled Florida matrices (SURVEY.md §4 fixtures)."""
    Ab = read_bin(f"{REF_DATA}/FloridaCollection/G55.bin")
    Am = read_mtx(f"{REF_DATA}/FloridaCollection/G55.mtx")
    assert Ab.shape == Am.shape
    assert np.abs(Ab - Am).max() < 1e-12


def test_sbin_roundtrip_and_compression(tmp_path):
    """GR-compressed .sbin format: exact roundtrip, smaller than .bin."""
    from saena_tpu.io.readers import read_sbin, write_sbin

    A = laplacian3D(14, 14, 14)
    p_sbin = str(tmp_path / "m.sbin")
    p_bin = str(tmp_path / "m.bin")
    write_sbin(p_sbin, A)
    write_bin(p_bin, A)
    B = read_sbin(p_sbin)
    assert (A - B).nnz == 0
    assert os.path.getsize(p_sbin) < os.path.getsize(p_bin)


def test_sbin_magic_check(tmp_path):
    from saena_tpu.io.readers import read_sbin

    p = str(tmp_path / "junk.sbin")
    open(p, "wb").write(b"NOTMAGIC" + b"\0" * 64)
    with pytest.raises(ValueError, match="not a saena_tpu"):
        read_sbin(p)


def test_zero_diagonal_guard():
    """G55-style zero-diagonal matrices must fail setup loudly, not NaN."""
    from saena_tpu.config import Options
    from saena_tpu.amg import hierarchy as H

    A = laplacian2D(8, 8).tolil()
    A[5, 5] = 0.0
    with pytest.raises(ValueError, match="zero diagonal"):
        H.setup(A.tocsr(), Options())
