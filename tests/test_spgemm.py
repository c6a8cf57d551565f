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
