"""p-coarsening (modal high-order FEM) path — config 4 family.

The reference receives element maps / g2u / bdydof from the embedding
Nektar++ application (amg::set_matrix overload, saena.hpp:202); these tests
construct small modal meshes directly and check the selection formulas,
injection P, and a full p+h multigrid solve on a synthetic high-order
system. The bundled Helmholtz2D matrices are solved through the default
h-path as a robustness check."""
import os

import numpy as np
import pytest
import scipy.sparse as sp

from saena_tpu.config import Options
from saena_tpu.amg import hierarchy as H
from saena_tpu.amg import solvers as S
from saena_tpu.amg.pcoarsen import (
    QUAD, SEG, TRI,
    coarse_dof_positions,
    element_type,
    modal_block_plevels,
    pcoarsen_plevels,
    pcoarsen_step,
)

REF_HELM = "/root/reference/data/Helmholtz2D_CG_curved_tri"


def test_element_type_inference():
    assert element_type(9, 2) == QUAD        # (2+1)^2
    assert element_type(6, 2) == TRI         # (2+1)(2+2)/2
    assert element_type(27, 2) == 3          # HEX
    assert element_type(10, 2) == 2          # TET (p=2): 10 dofs
    assert element_type(3, 2) == SEG         # 1-D modal unit: order+1
    assert element_type(3, 1) == TRI         # at order 1, 3 dofs = TRI


def test_quad_selection_order2_to_1():
    pos = coarse_dof_positions(2, 1, QUAD)
    np.testing.assert_array_equal(pos, [0, 1, 3, 4])


def test_tri_selection_order2_to_1():
    pos = coarse_dof_positions(2, 1, TRI)
    np.testing.assert_array_equal(pos, [0, 1, 3])


def test_tri_selection_order4_to_2():
    pos = coarse_dof_positions(4, 2, TRI)
    # i=0: j=0..2 -> 0,1,2 ; i=1: (2*4+3-1)*1/2=5 -> 5,6 ; i=2: (2*4+3-2)*2/2=9 -> 9
    np.testing.assert_array_equal(pos, [0, 1, 2, 5, 6, 9])


def _two_quad_mesh(order):
    """Two order-p quads sharing an edge; returns (elem_maps 1-based, n_nodes).
    Local numbering row-major per element; shared edge = last column of elem 0
    = first column of elem 1."""
    op1 = order + 1
    grid = np.arange(1, op1 * (2 * op1 - 1) + 1).reshape(op1, 2 * op1 - 1)
    e0 = grid[:, :op1].ravel()
    e1 = grid[:, op1 - 1:].ravel()
    return [e0, e1], grid.size


def test_pcoarsen_step_shared_edge():
    maps, n = _two_quad_mesh(2)
    step = pcoarsen_step(maps, order=2, next_order=1, bdydof=0)
    # modal selection keeps each element's LOW-MODE dofs (positions 0,1,3,4),
    # which for this synthetic numbering are disjoint between the elements
    assert step.P.shape[1] == 8
    # injection: every column has at least a single 1
    assert (step.P.data == 1.0).all()
    assert step.P.shape[0] <= n


def test_pcoarsen_plevels_chain():
    maps, n = _two_quad_mesh(4)
    Ps = pcoarsen_plevels(maps, order=4, order_dif=[2, 1], bdydof=0, n_fine=n)
    # order 4 -> 2 -> 1: two levels
    assert len(Ps) == 2
    assert Ps[0].shape[0] == n
    assert Ps[0].shape[1] == Ps[1].shape[0]


def test_p_then_h_multigrid_solve():
    """Full p+h hierarchy on a synthetic SPD high-order system."""
    maps, n = _two_quad_mesh(4)
    rng = np.random.default_rng(0)
    # synthetic SPD "stiffness": assembled element matrices
    A = sp.lil_matrix((n, n))
    for nodes in maps:
        k = nodes.size
        E = rng.standard_normal((k, 2 * k))
        Ke = E @ E.T / k + 2 * np.eye(k)
        idx = np.asarray(nodes) - 1
        A[np.ix_(idx, idx)] += Ke
    A = A.tocsr()
    rhs = A @ np.ones(n)

    Ps = pcoarsen_plevels(maps, order=4, order_dif=[1, 1, 1], bdydof=0, n_fine=n)
    opts = Options(least_row_threshold=4)
    hier, info = H.setup(A, opts, p_levels=Ps)
    assert info.coarsen_kinds[: len(Ps)] == ["p"] * len(Ps)
    params = H.SolveParams.from_options(opts)
    res = S.solve_pCG(hier, np.pad(rhs, (0, hier.n_pad - n)),
                      params=params, tol=1e-8, max_iter=200)
    u = np.asarray(res.u)[:n]
    assert np.linalg.norm(rhs - A @ u) / np.linalg.norm(rhs) < 1e-7


@pytest.mark.skipif(not os.path.isdir(REF_HELM), reason="reference data absent")
@pytest.mark.parametrize("p", [2, 3])
def test_helmholtz_matrices_solve(p):
    """Bundled Helmholtz2D high-order matrices through the h-path."""
    from saena_tpu.io.readers import read_bin

    A = read_bin(f"{REF_HELM}/Helmholtz2D_CG_P{p}_Modes_curved_tri.bin")
    n = A.shape[0]
    rhs = A @ np.ones(n)
    opts = Options()
    hier, info = H.setup(A, opts)
    params = H.SolveParams.from_options(opts)
    res = S.solve_pCG(hier, np.pad(rhs, (0, hier.n_pad - n)),
                      params=params, tol=1e-8, max_iter=300)
    u = np.asarray(res.u)[:n]
    assert np.linalg.norm(rhs - A @ u) / np.linalg.norm(rhs) < 1e-6


@pytest.mark.skipif(not os.path.isdir(REF_HELM), reason="reference data absent")
def test_nektar_session_reader():
    """Decode the bundled Nektar session: mesh counts, Euler characteristic,
    boundary composites, and the derived modal-unit count that matches the
    bundled matrix sizes (n = interior_edges * nummodes)."""
    from saena_tpu.io.nektar import read_nektar
    from saena_tpu.io.readers import read_bin

    mesh = read_nektar(f"{REF_HELM}/Helmholtz2D_CG_P3_Modes_curved_tri.xml")
    V, E, T = len(mesh.vert_ids), len(mesh.edge_ids), len(mesh.tri_ids)
    assert (V, E, T) == (28, 63, 36)
    assert V - E + T == 1                      # triangulated disk
    assert mesh.dim == 2 and mesh.basis_type == "MODIFIED"
    assert mesh.nummodes == 3                  # "P3" files = NUMMODES 3
    assert mesh.edges.max() < V and mesh.tris.max() < E
    nb = mesh.boundary_edges.size
    assert nb == 21 and mesh.interior_edges.size == E - nb == 42
    for p in (2, 3, 4, 5):
        A = read_bin(f"{REF_HELM}/Helmholtz2D_CG_P{p}_Modes_curved_tri.bin")
        assert A.shape[0] == mesh.interior_edges.size * p


@pytest.mark.skipif(not os.path.isdir(REF_HELM), reason="reference data absent")
def test_helmholtz_modal_block_detection():
    """Every bundled matrix is exactly 42 modal units with dense p x p
    inter-unit blocks — the layout modal_block_plevels coarsens."""
    from saena_tpu.amg.pcoarsen import detect_modal_blocks
    from saena_tpu.io.readers import read_bin

    for p in (2, 3, 4, 5):
        A = read_bin(f"{REF_HELM}/Helmholtz2D_CG_P{p}_Modes_curved_tri.bin")
        assert detect_modal_blocks(A, p) == 42
    with pytest.raises(ValueError):
        detect_modal_blocks(A, 4)              # 210 not divisible by 4


def test_modal_block_plevels_matches_seg_maps():
    """modal_block_plevels == pcoarsen_plevels over SEG element maps."""
    n_units, p = 5, 4
    Ps_fast = modal_block_plevels(n_units, p)
    # SEG maps: unit u owns 1-based nodes [u*p+1 .. (u+1)*p], bdydof=0
    maps = [np.arange(u * p + 1, (u + 1) * p + 1) for u in range(n_units)]
    Ps_ref = pcoarsen_plevels(maps, order=p - 1, order_dif=[1, 1],
                              bdydof=0, n_fine=n_units * p)
    assert len(Ps_fast) == len(Ps_ref) == 2
    for Pf, Pr in zip(Ps_fast, Ps_ref):
        assert (Pf != Pr).nnz == 0


@pytest.mark.skipif(not os.path.isdir(REF_HELM), reason="reference data absent")
def test_helmholtz_p_coarsening_solve():
    """Config 4: the TRUE p-coarsening path on the bundled P5 matrix —
    modal injection chain P5->P4->P3->P2, then h-coarsening; p-multigrid
    must converge at least as fast as h-only (measured: 12 vs 19 iters)."""
    from saena_tpu.amg.pcoarsen import modal_block_plevels
    from saena_tpu.io.readers import read_bin

    A = read_bin(f"{REF_HELM}/Helmholtz2D_CG_P5_Modes_curved_tri.bin")
    n = A.shape[0]
    rhs = A @ np.ones(n)
    opts = Options(least_row_threshold=20)
    params = H.SolveParams.from_options(opts)

    Ps = modal_block_plevels(42, 5)
    assert [P.shape for P in Ps] == [(210, 168), (168, 126), (126, 84)]
    hier, info = H.setup(A, opts, p_levels=Ps)
    assert info.coarsen_kinds[:3] == ["p", "p", "p"]
    assert "h" in info.coarsen_kinds[3:]
    res = S.solve_pCG(hier, np.pad(rhs, (0, hier.n_pad - n)),
                      params=params, tol=1e-8, max_iter=200)
    u = np.asarray(res.u)[:n]
    assert np.linalg.norm(rhs - A @ u) / np.linalg.norm(rhs) < 1e-7

    hier_h, _ = H.setup(A, opts)
    res_h = S.solve_pCG(hier_h, np.pad(rhs, (0, hier_h.n_pad - n)),
                        params=params, tol=1e-8, max_iter=200)
    assert int(res.iters) <= int(res_h.iters)
