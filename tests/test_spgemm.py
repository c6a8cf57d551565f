"""Ring SpGEMM vs scipy oracle (SURVEY.md §7 step 4 gate: C == scipy R@A@P)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from saena_tpu.generators import laplacian2D, random_symm_matrix
from saena_tpu.ops.spgemm import matmat, triple_product
from saena_tpu.parallel.sharded import make_mesh

D = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= D
    return make_mesh(D)


def test_matmat_random(mesh):
    A = random_symm_matrix(300, 0.05, seed=1)
    B = random_symm_matrix(300, 0.05, seed=2)
    C = matmat(A, B, mesh, dtype=jnp.float64)
    ref = (A @ B).tocsr()
    assert np.abs(C - ref).max() < 1e-10


def test_matmat_rectangular(mesh):
    rng = np.random.default_rng(3)
    A = sp.random(220, 150, density=0.1, random_state=4, format="csr")
    B = sp.random(150, 90, density=0.1, random_state=5, format="csr")
    C = matmat(A, B, mesh, dtype=jnp.float64)
    ref = (A @ B).tocsr()
    assert np.abs(C - ref).max() < 1e-10


def test_triple_product_vs_scipy(mesh):
    """Galerkin RAP through the ring engine == scipy (config 3 oracle)."""
    from saena_tpu.amg.strength import find_aggregation
    from saena_tpu.amg.prolongation import smoothed_prolongator, restriction

    A = laplacian2D(24, 24)
    agg, n_c, _ = find_aggregation(A, 0.3)
    P_ = smoothed_prolongator(A, agg, n_c)
    R = restriction(P_)
    Ac = triple_product(R, A, P_, mesh, dtype=jnp.float64, tol=1e-13)
    ref = (R @ A @ P_).tocsr()
    ref.data[np.abs(ref.data) < 1e-13] = 0.0
    ref.eliminate_zeros()
    assert np.abs(Ac - ref).max() < 1e-9


# ---------------------------------------------------------------------------
# block-sparse engine (host symbolic + device numeric, ops/bspgemm.py)
# ---------------------------------------------------------------------------


def test_bsp_single_device_random():
    from saena_tpu.ops.bspgemm import spgemm_blocks

    A = sp.random(500, 700, density=0.02, random_state=1, format="csr")
    B = sp.random(700, 300, density=0.03, random_state=2, format="csr")
    C = spgemm_blocks(A, B, dtype=jnp.float64)
    assert np.abs(C - (A @ B).tocsr()).max() < 1e-12


def test_bsp_single_device_empty_and_bk128():
    from saena_tpu.ops.bspgemm import spgemm_blocks

    Z = sp.csr_matrix((100, 80))
    B = sp.random(80, 60, density=0.05, random_state=3, format="csr")
    assert spgemm_blocks(Z, B, dtype=jnp.float64).nnz == 0
    A = random_symm_matrix(200, 0.2, seed=7)   # dense rows -> bk=128 pick
    C = spgemm_blocks(A, A, dtype=jnp.float64)
    assert np.abs(C - (A @ A).tocsr()).max() < 1e-10


def test_bsp_florida_sih4():
    """Irregular sparsity oracle (config 3): SiH4 @ SiH4 == scipy."""
    import os
    path = "/root/reference/data/FloridaCollection/SiH4.bin"
    if not os.path.exists(path):
        pytest.skip("reference data absent")
    from saena_tpu import Matrix
    from saena_tpu.ops.bspgemm import spgemm_blocks

    M = Matrix(); M.read_file(path); M.assemble()
    A = M.csr
    C = spgemm_blocks(A, A, dtype=jnp.float64)
    ref = (A @ A).tocsr()
    assert np.abs(C - ref).max() < 1e-10 * max(1.0, abs(ref).max())


def test_bsp_ring_matches_scipy(mesh):
    from saena_tpu.ops.bspgemm import matmat_sparse

    A = sp.random(500, 700, density=0.02, random_state=11, format="csr")
    B = sp.random(700, 300, density=0.03, random_state=12, format="csr")
    C = matmat_sparse(A, B, mesh, dtype=jnp.float64)
    assert np.abs(C - (A @ B).tocsr()).max() < 1e-12


def test_bsp_ring_rap_memory_prop_nnz(mesh):
    """VERDICT r1 gate: device RAP through the block-sparse ring on the
    8-device mesh — exact vs scipy, with peak block memory ∝ nonzero
    blocks (here >10x below the dense ring's O(n^2/D) footprint)."""
    from saena_tpu.core.coo import remove_boundary_nodes
    from saena_tpu.generators import laplacian3D
    from saena_tpu.amg.strength import find_aggregation
    from saena_tpu.amg.prolongation import smoothed_prolongator, restriction
    from saena_tpu.ops.bspgemm import _ring_plan, matmat_sparse, pick_bk
    from saena_tpu.parallel.partition import equal_row_split

    A, *_ = remove_boundary_nodes(laplacian3D(32, 32, 32), np.zeros(32 ** 3))
    agg, n_c, _ = find_aggregation(A, 0.3)
    P_ = smoothed_prolongator(A, agg, n_c)
    R = restriction(P_)
    RA = matmat_sparse(R, A, mesh, dtype=jnp.float64)
    Ac = matmat_sparse(RA, P_, mesh, dtype=jnp.float64)
    ref = (R @ A @ P_).tocsr()
    assert np.abs(Ac - ref).max() < 1e-11

    bk = pick_bk(R, A)
    plan = _ring_plan(R, A, 8, bk, equal_row_split(R.shape[0], 8),
                      equal_row_split(A.shape[0], 8), np.float64)
    block_elems = plan.Ab.size + plan.Bb.size + 8 * (plan.nC_max + 1) * 1024
    dense_elems = (R.shape[0] * R.shape[1] + A.shape[0] * A.shape[1]
                   + R.shape[0] * A.shape[1])
    assert block_elems < dense_elems / 10


def test_matmat_auto_routes_sparse(mesh):
    """matmat(mode="auto") must take the block-sparse ring for operands too
    sparse/big for dense blocks, and still match scipy."""
    from saena_tpu.ops.spgemm import _use_dense_ring

    A = sp.random(3000, 3000, density=0.001, random_state=21, format="csr")
    B = sp.random(3000, 3000, density=0.001, random_state=22, format="csr")
    assert not _use_dense_ring(A, B, D)
    C = matmat(A, B, mesh, dtype=jnp.float64)
    assert np.abs(C - (A @ B).tocsr()).max() < 1e-12


def test_api_matmat_device_routing(mesh):
    """AMG.matmat(A, B, mesh=...) routes through the device rings and
    matches scipy on a Florida fixture (VERDICT r3 #4; ref
    saena::amg::matmat -> setup_matmat.cpp:1164-1487). The no-mesh call
    stays the host product."""
    import os

    from saena_tpu import AMG, Matrix
    from saena_tpu.io.readers import read_matrix

    path = "/root/reference/data/FloridaCollection/bcsstk16.mtx"
    if os.path.exists(path):
        A_csr = read_matrix(path).tocsr()
    else:
        A_csr = sp.random(2000, 2000, density=0.003, random_state=3,
                          format="csr")
    A = Matrix(); A.set_csr(A_csr); A.assemble()
    B = Matrix(); B.set_csr(A_csr.T.tocsr()); B.assemble()
    amg = AMG()
    C_dev = amg.matmat(A, B, mesh=mesh, dtype=jnp.float64)
    C_host = amg.matmat(A, B)
    ref = (A_csr @ A_csr.T).tocsr()
    assert np.abs(C_dev.csr - ref).max() <= 1e-9 * max(1.0, abs(ref).max())
    assert np.abs(C_host.csr - ref).max() <= 1e-9 * max(1.0, abs(ref).max())
