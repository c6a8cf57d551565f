"""Distributed SpGEMM: ring-pipelined C = A @ B over the device mesh.

TPU-native re-design of the reference's matmat engine
(saena_object_setup_matmat.cpp:1710-2470): there, B's CSC blocks rotate
around an MPI ring (GR-compressed), each step overlapping the transfer with
a recursive fast_mm local multiply whose base case is MKL's CSR SpGEMM with
a bounded dense accumulator (matmat_thre1 = 2e7 caps row_sz*col_sz).

Here the ring is a `lax.ppermute` rotation inside shard_map and the local
multiply is re-thought for the hardware:

- "dense" mode: blocks are densified and each ring step is one MXU
  `jnp.dot`. On TPU the MXU delivers ~1e14 flop/s, so for the densities the
  reference's gemm benchmark sweeps (>= ~0.5%), dense blocks beat any sparse
  scheme — the dense accumulator the reference bounds with matmat_thre1 is
  promoted to the whole strategy.
- "spmm" mode: A stays slot-major ELL and each step gathers rows of the
  current dense B block (VPU path) — for very sparse operands where the MXU
  would be >99% zeros.

XLA's async collectives overlap the ppermute with the local dot, mirroring
the reference's Isend/Irecv-overlapped pipeline (:1986-2103).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, PartitionSpec as P

from saena_tpu.ops.formats import pad_to
from saena_tpu.parallel.partition import equal_row_split


def _dense_blocks(A: sp.spmatrix, split: np.ndarray, n_cols_pad: int, dtype):
    """(D, n_loc_pad, n_cols_pad) dense row blocks."""
    D = len(split) - 1
    n_loc_pad = pad_to(int(np.max(np.diff(split))))
    out = np.zeros((D, n_loc_pad, n_cols_pad), dtype=np.float64)
    A = A.tocsr()
    for d in range(D):
        blk = A[split[d]: split[d + 1]]
        out[d, : blk.shape[0], : blk.shape[1]] = blk.todense()
    return jnp.asarray(out, dtype=dtype), n_loc_pad


@partial(jax.jit, static_argnames=("mesh", "axis", "precision"))
def _ring_spgemm_dense(A_blocks, B_blocks, mesh: Mesh, axis: str = "d",
                       precision=jax.lax.Precision.HIGHEST):
    """A_blocks: (D, n_loc_pad, m_pad) — A row blocks, columns in
    blocked-padded layout of B's row space (m_pad = D * m_loc_pad).
    B_blocks: (D, m_loc_pad, k_pad). Returns C blocks (D, n_loc_pad, k_pad)."""
    D = mesh.devices.size

    def body(A_loc, B_loc):
        A_loc, B_loc = A_loc[0], B_loc[0]
        m_loc = B_loc.shape[0]
        my = jax.lax.axis_index(axis)
        C = jnp.zeros((A_loc.shape[0], B_loc.shape[1]), dtype=A_loc.dtype)

        def step(s, carry):
            B_cur, C = carry
            e = ((my + s) % D).astype(jnp.int32)
            A_slice = jax.lax.dynamic_slice(
                A_loc, (jnp.int32(0), e * jnp.int32(m_loc)),
                (A_loc.shape[0], m_loc))
            # HIGHEST: multi-pass bf16 emulation of f32 multiplies on the
            # MXU — the reference computes in f64, so default to accuracy
            C = C + jnp.dot(A_slice, B_cur, preferred_element_type=C.dtype,
                            precision=precision)
            B_next = jax.lax.ppermute(
                B_cur, axis, perm=[(j, (j - 1) % D) for j in range(D)])
            return B_next, C

        _, C = jax.lax.fori_loop(0, D, step, (B_loc, C))
        return C[None]

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis)), out_specs=P(axis),
        check_vma=False,
    )(A_blocks, B_blocks)


def matmat_prepare(A: sp.spmatrix, B: sp.spmatrix, mesh: Mesh,
                   axis: str = "d", dtype=jnp.float32):
    """Host -> device distribution, ONCE: the analog of the reference's
    assemble + CSC conversion + compress_prep done BEFORE its timed matmat
    loop (setup_matmat.cpp:1164-1360). Returns (A_blocks, B_blocks,
    a_split) — device-resident operands for repeated matmat_run calls."""
    if A.shape[1] != B.shape[0]:
        raise ValueError("inner dimensions must match")
    D = mesh.devices.size
    a_split = equal_row_split(A.shape[0], D)
    b_split = equal_row_split(B.shape[0], D)
    m_loc_pad = pad_to(int(np.max(np.diff(b_split))))
    k_pad = pad_to(B.shape[1])

    # A's columns must address the blocked-padded layout of B's rows
    A_perm = _blocked_pad_cols(A.tocsc(), b_split, m_loc_pad)
    A_blocks, _ = _dense_blocks(A_perm, a_split, D * m_loc_pad, dtype)
    B_blocks, _ = _dense_blocks(B, b_split, k_pad, dtype)
    return A_blocks, B_blocks, a_split


def matmat_run(A_blocks, B_blocks, mesh: Mesh, axis: str = "d",
               precision=jax.lax.Precision.HIGHEST):
    """The ring product on device-resident operands (the timed region of
    the reference's matmat benchmark)."""
    return _ring_spgemm_dense(A_blocks, B_blocks, mesh, axis,
                              precision=precision)


# density/size switch between the dense MXU ring and the block-sparse ring
# (the role matmat_thre1/matmat_thre2 play in the reference's fast_mm,
# saena_object.h:75-85): dense blocks win on the MXU once operands are a
# few-percent dense AND the O(n*m/D) block memory is affordable.
MATMAT_DENSE_THRE = 0.01        # min operand density for the dense ring
MATMAT_DENSE_ELEMS = 5e7        # max per-device dense-block elements


def _use_dense_ring(A: sp.spmatrix, B: sp.spmatrix, D: int) -> bool:
    dens_a = A.nnz / max(1, A.shape[0] * A.shape[1])
    dens_b = B.nnz / max(1, B.shape[0] * B.shape[1])
    elems = (A.shape[0] * A.shape[1] + B.shape[0] * B.shape[1]
             + A.shape[0] * B.shape[1]) / max(1, D)
    return min(dens_a, dens_b) >= MATMAT_DENSE_THRE and \
        elems <= MATMAT_DENSE_ELEMS


def matmat(
    A: sp.spmatrix,
    B: sp.spmatrix,
    mesh: Mesh,
    axis: str = "d",
    dtype=jnp.float32,
    assemble: bool = True,
    tol: float = 0.0,
    mode: str = "auto",
):
    """Distributed C = A @ B on the mesh (ref saena::amg::matmat,
    setup_matmat.cpp:1164-1487). mode: "auto" picks dense-MXU-ring vs
    block-sparse ring by operand density (the matmat_thre1 analog);
    "dense"/"sparse" force a path. Returns scipy CSR when assemble else
    the dense sharded blocks + row split (dense path only)."""
    D = mesh.devices.size
    use_dense = (mode == "dense") or (mode == "auto" and
                                      _use_dense_ring(A, B, D))
    if not use_dense and assemble:
        from saena_tpu.ops.bspgemm import matmat_sparse
        return matmat_sparse(A, B, mesh, axis=axis, dtype=dtype, tol=tol)

    A_blocks, B_blocks, a_split = matmat_prepare(A, B, mesh, axis, dtype)
    C_blocks = _ring_spgemm_dense(A_blocks, B_blocks, mesh, axis)
    if not assemble:
        return C_blocks, a_split

    C = np.zeros((A.shape[0], B.shape[1]))
    cb = np.asarray(C_blocks)
    for d in range(D):
        rows = a_split[d + 1] - a_split[d]
        C[a_split[d]: a_split[d + 1]] = cb[d, :rows, : B.shape[1]]
    Cs = sp.csr_matrix(C)
    if tol > 0:
        Cs.data[np.abs(Cs.data) < tol] = 0.0
    Cs.eliminate_zeros()
    return Cs


def _blocked_pad_cols(A_csc: sp.csc_matrix, col_split: np.ndarray,
                      n_loc_pad: int) -> sp.csr_matrix:
    """Re-index A's columns into the blocked-padded layout of col_split."""
    coo = A_csc.tocoo()
    own = np.searchsorted(col_split, coo.col, side="right") - 1
    new_col = own * n_loc_pad + (coo.col - col_split[own])
    D = len(col_split) - 1
    return sp.csr_matrix(
        (coo.data, (coo.row, new_col)), shape=(A_csc.shape[0], D * n_loc_pad))


def triple_product(
    R: sp.spmatrix, A: sp.spmatrix, P_: sp.spmatrix, mesh: Mesh,
    dtype=jnp.float32, tol: float = 1e-14, mode: str = "auto",
) -> sp.csr_matrix:
    """Distributed Galerkin Ac = R*A*P as two ring SpGEMMs
    (ref triple_mat_mult, saena_object_setup2.cpp:361-849). Sparse fine
    operators route through the block-sparse ring (memory ∝ nonzero
    blocks), so device RAP scales with nnz instead of O(n^2/D)."""
    RA = matmat(R, A, mesh, dtype=dtype, tol=tol, mode=mode)
    return matmat(RA, P_, mesh, dtype=dtype, tol=tol, mode=mode)
