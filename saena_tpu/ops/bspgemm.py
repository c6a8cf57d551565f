"""Block-sparse SpGEMM: host symbolic phase + device numeric phase.

TPU-native replacement for the reference's sparse distributed SpGEMM engine
(fast_mm + matmat_CSC, saena_object_setup_matmat.cpp:27-1163, 1710-2470).
The reference bounds a dense accumulator with matmat_thre1 and recurses;
the TPU re-design splits the product the way the hardware wants it split:

- **Host symbolic** (numpy, integer-only): tile A into (8, bk) blocks and
  B into (bk, 128) blocks, keep only nonzero tiles, and enumerate the
  contributing block pairs (a, b) -> c with c = (A.block_row, B.block_col).
  This is the analog of the reference precomputing the output structure —
  SpGEMM's data-dependent shapes live on the host, never under jit.
- **Device numeric** (jit, static shapes): gather the paired tiles, run one
  batched (8, bk) @ (bk, 128) MXU contraction per pair, and scatter-add by
  sorted c-id into the output block stack. All FLOPs ride the MXU; memory
  is proportional to the number of NONZERO blocks (nnz x the block fill
  factor), never O(n^2).

The distributed form rotates B's row-owner block stacks around a
`lax.ppermute` ring (the reference's Isend/Irecv ring, :1986-2103) with the
per-(device, step) pair lists precomputed and padded on the host.

bk (the contraction width) trades block fill for MXU shape: 32 keeps memory
tight on ~5-30 nnz/row operators (AMG fine levels), 128 suits denser
mid-level operators. The auto pick mirrors matmat_thre1's role as a
density switch (saena_object.h:75-85).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, PartitionSpec as P

CHUNK = 512          # pairs per numeric inner step: bounds the gathered
                     # operand slab to CHUNK*(8+bk)*128 elements of VMEM/HBM
                     # traffic per iteration


# ---------------------------------------------------------------------------
# host symbolic helpers
# ---------------------------------------------------------------------------


def _block_left(A: sp.spmatrix, bk: int, col_block_of=None, n_bc=None):
    """Tile A into (8, bk) nonzero blocks.

    Returns (blocks, abr, abc): blocks (nA, 8, bk) float64, abr/abc int64
    block coordinates. ``col_block_of``/``n_bc`` optionally remap columns
    into an owner-padded block-column space (distributed case)."""
    A = A.tocoo()
    n, m = A.shape
    br = A.row // 8
    if col_block_of is None:
        bc = A.col // bk
        sub_c = A.col % bk
        n_bc = -(-m // bk)
    else:
        bc, sub_c = col_block_of(A.col)
    key = br.astype(np.int64) * n_bc + bc
    uniq, inv = np.unique(key, return_inverse=True)
    blocks = np.zeros((len(uniq), 8, bk))
    blocks[inv, A.row % 8, sub_c] = A.data
    return blocks, (uniq // n_bc).astype(np.int64), (uniq % n_bc).astype(np.int64)


def _block_right(B: sp.spmatrix, bk: int):
    """Tile B into (bk, 128) nonzero blocks. Returns (blocks, bbr, bbc)."""
    B = B.tocoo()
    n, m = B.shape
    br = B.row // bk
    bc = B.col // 128
    n_bc = -(-m // 128)
    key = br.astype(np.int64) * n_bc + bc
    uniq, inv = np.unique(key, return_inverse=True)
    blocks = np.zeros((len(uniq), bk, 128))
    blocks[inv, B.row % bk, B.col % 128] = B.data
    return blocks, (uniq // n_bc).astype(np.int64), (uniq % n_bc).astype(np.int64)


def _pairs(abr, abc, bbr, bbc, n_bc_C):
    """Contributing pairs (a, b) with abc[a] == bbr[b], plus the compacted
    output block id per pair (sorted by c so the scatter-add is sorted).

    Returns (a_idx, b_idx, c_idx, c_keys) with c_keys the sorted unique
    (C.block_row * n_bc_C + C.block_col) keys."""
    if abr.size == 0 or bbr.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z
    order_b = np.argsort(bbr, kind="stable")
    bbr_s = bbr[order_b]
    n_k = int(max(abc.max(), bbr.max())) + 1
    starts = np.searchsorted(bbr_s, np.arange(n_k + 1))
    cnt = np.diff(starts)                     # B blocks per block-row k
    rep = cnt[abc]                            # pairs contributed per A block
    total = int(rep.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z
    a_idx = np.repeat(np.arange(abr.size, dtype=np.int64), rep)
    cum = np.cumsum(rep) - rep
    pos = np.arange(total, dtype=np.int64) - np.repeat(cum, rep)
    b_idx = order_b[np.repeat(starts[abc], rep) + pos]
    c_key = abr[a_idx] * n_bc_C + bbc[b_idx]
    c_keys, c_idx = np.unique(c_key, return_inverse=True)
    order = np.argsort(c_idx, kind="stable")
    return a_idx[order], b_idx[order], c_idx[order], c_keys


def _pad_pairs(a_idx, b_idx, c_idx, n_cblocks, chunk=CHUNK, min_len=None):
    """Pad pair lists to a chunk multiple; padding scatters into the dummy
    block n_cblocks."""
    p = a_idx.size
    target = max(min_len or 0, -(-max(p, 1) // chunk) * chunk)
    pad = target - p
    a = np.concatenate([a_idx, np.zeros(pad, np.int64)]).astype(np.int32)
    b = np.concatenate([b_idx, np.zeros(pad, np.int64)]).astype(np.int32)
    c = np.concatenate([c_idx, np.full(pad, n_cblocks, np.int64)]).astype(np.int32)
    return a, b, c


# ---------------------------------------------------------------------------
# device numeric phase
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_cblocks", "chunk"))
def _bsp_numeric(Ab, Bb, a_idx, b_idx, c_idx, n_cblocks: int,
                 chunk: int = CHUNK):
    """C[c] += A[a] @ B[b] over the padded pair lists. One extra dummy
    output block absorbs the padding."""
    n_chunks = a_idx.shape[0] // chunk
    C = jnp.zeros((n_cblocks + 1, 8, 128), dtype=Ab.dtype)

    def body(s, C):
        sl = (s * chunk,)
        ai = jax.lax.dynamic_slice(a_idx, sl, (chunk,))
        bi = jax.lax.dynamic_slice(b_idx, sl, (chunk,))
        ci = jax.lax.dynamic_slice(c_idx, sl, (chunk,))
        prod = jnp.einsum(
            "pik,pkj->pij", Ab[ai], Bb[bi],
            preferred_element_type=C.dtype,
            precision=jax.lax.Precision.HIGHEST)
        return C.at[ci].add(prod)

    return jax.lax.fori_loop(0, n_chunks, body, C)


def _assemble_csr(C_blocks: np.ndarray, c_keys: np.ndarray, n_bc: int,
                  shape, tol: float = 0.0) -> sp.csr_matrix:
    """Nonzero entries of the block stack -> scipy CSR."""
    nb = c_keys.size
    if nb == 0:
        return sp.csr_matrix(shape)
    blk = C_blocks[:nb]
    cb_r = (c_keys // n_bc) * 8
    cb_c = (c_keys % n_bc) * 128
    bi, ri, ci = np.nonzero(blk if tol <= 0 else (np.abs(blk) > tol))
    rows = cb_r[bi] + ri
    cols = cb_c[bi] + ci
    keep = (rows < shape[0]) & (cols < shape[1])
    M = sp.csr_matrix(
        (blk[bi[keep], ri[keep], ci[keep]], (rows[keep], cols[keep])),
        shape=shape)
    M.sum_duplicates()
    M.sort_indices()
    return M


def pick_bk(A: sp.spmatrix, B: sp.spmatrix) -> int:
    """Contraction width: 32 for sparse operands (tight blocks), 128 once
    the inner dimension's rows are dense enough that wide blocks fill."""
    nnz_per_row = B.nnz / max(1, B.shape[0])
    return 128 if nnz_per_row >= 24 else 32


def spgemm_blocks(A: sp.spmatrix, B: sp.spmatrix, dtype=jnp.float64,
                  bk: int | None = None, tol: float = 0.0) -> sp.csr_matrix:
    """Single-device block-sparse C = A @ B: host symbolic, device numeric.
    FLOPs run as batched MXU contractions; memory ∝ nonzero blocks."""
    if A.shape[1] != B.shape[0]:
        raise ValueError("inner dimensions must match")
    bk = bk or pick_bk(A, B)
    Ab, abr, abc = _block_left(A, bk)
    Bb, bbr, bbc = _block_right(B, bk)
    n_bc_C = -(-B.shape[1] // 128)
    a_idx, b_idx, c_idx, c_keys = _pairs(abr, abc, bbr, bbc, n_bc_C)
    if c_keys.size == 0:
        return sp.csr_matrix((A.shape[0], B.shape[1]))
    a, b, c = _pad_pairs(a_idx, b_idx, c_idx, c_keys.size)
    C = _bsp_numeric(
        jnp.asarray(Ab, dtype=dtype), jnp.asarray(Bb, dtype=dtype),
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), c_keys.size)
    return _assemble_csr(np.asarray(C), c_keys, n_bc_C,
                         (A.shape[0], B.shape[1]), tol)


# ---------------------------------------------------------------------------
# distributed ring form
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _RingPlan:
    """Host-precomputed symbolic structure for one ring product."""

    Ab: jax.Array          # (D, nA_max, 8, bk)
    Bb: jax.Array          # (D, nB_max, bk, 128)
    AI: jax.Array          # (D, D, P_max) int32 — pair a-ids per (dev, step)
    BI: jax.Array          # (D, D, P_max)
    CI: jax.Array          # (D, D, P_max)
    NCK: jax.Array         # (D, D) int32 — live chunk count per (dev, step):
                           # ring steps whose owner contributes no pairs cost
                           # zero numeric work (band operators have most of
                           # their pairs at owners e ~ d)
    c_keys: list           # per-device sorted C block keys (host)
    n_cb: list             # per-device C block count
    nC_max: int
    n_bc_C: int
    shape: tuple
    a_split: np.ndarray


def _ring_plan(A: sp.spmatrix, B: sp.spmatrix, D: int, bk: int,
               a_split: np.ndarray, b_split: np.ndarray, dtype) -> _RingPlan:
    # owner-padded block-column space for A's columns (= B's row space)
    brows_per = np.array([-(-(b_split[e + 1] - b_split[e]) // bk)
                          for e in range(D)])
    cb_off = np.concatenate([[0], np.cumsum(brows_per)])
    n_bc_A = int(cb_off[-1])

    own = np.searchsorted(b_split, np.arange(B.shape[0]), side="right") - 1

    def col_block_of(cols):
        e = np.searchsorted(b_split, cols, side="right") - 1
        loc = cols - b_split[e]
        return cb_off[e] + loc // bk, loc % bk

    n_bc_C = -(-B.shape[1] // 128)

    # per-owner B block stacks (local block rows)
    B_csr = B.tocsr()
    Bblocks, Bbr, Bbc = [], [], []
    for e in range(D):
        Be = B_csr[b_split[e]: b_split[e + 1]]
        blk, br, bc = _block_right(Be, bk)
        Bblocks.append(blk)
        Bbr.append(br)
        Bbc.append(bc)
    nB_max = max(1, max(b.shape[0] for b in Bblocks))

    # per-device A block stacks + per-step pair lists
    A_csr = A.tocsr()
    pairs = [[None] * D for _ in range(D)]
    Ablocks, c_keys_per_d, n_cb = [], [], []
    P_max = 1
    for d in range(D):
        Ad = A_csr[a_split[d]: a_split[d + 1]]
        blk, abr, abc = _block_left(Ad, bk, col_block_of=col_block_of,
                                    n_bc=n_bc_A)
        Ablocks.append(blk)
        # global c-key space for this device's C rows
        all_ak, all_bk_, all_ck = [], [], []
        for e in range(D):
            sel = (abc >= cb_off[e]) & (abc < cb_off[e + 1])
            ai, bi, _, _ = _pairs(abr[sel], abc[sel] - cb_off[e],
                                  Bbr[e], Bbc[e], n_bc_C)
            # remap ai back into the full per-device A block ids
            sel_ids = np.flatnonzero(sel)
            a_glob = sel_ids[ai]
            ckey = abr[a_glob] * n_bc_C + Bbc[e][bi]
            pairs[d][e] = (a_glob, bi, ckey)
            all_ck.append(ckey)
        ck_all = np.unique(np.concatenate(all_ck)) if all_ck else \
            np.zeros(0, np.int64)
        c_keys_per_d.append(ck_all)
        n_cb.append(ck_all.size)
        for e in range(D):
            P_max = max(P_max, pairs[d][e][0].size)
    nC_max = max(1, max(n_cb))
    nA_max = max(1, max(b.shape[0] for b in Ablocks))
    P_max = -(-P_max // CHUNK) * CHUNK

    Ab = np.zeros((D, nA_max, 8, bk))
    Bb = np.zeros((D, nB_max, bk, 128))
    AI = np.zeros((D, D, P_max), np.int32)
    BI = np.zeros((D, D, P_max), np.int32)
    CI = np.full((D, D, P_max), nC_max, np.int32)
    NCK = np.zeros((D, D), np.int32)
    for d in range(D):
        Ab[d, : Ablocks[d].shape[0]] = Ablocks[d]
        Bb[d, : Bblocks[d].shape[0]] = Bblocks[d]
        for e in range(D):
            s = (e - d) % D          # ring step at which d holds B_e
            a_g, bi, ckey = pairs[d][e]
            if a_g.size == 0:
                continue
            ci = np.searchsorted(c_keys_per_d[d], ckey)
            a, b, c = _pad_pairs(a_g, bi, ci, n_cb[d], min_len=P_max)
            # remap padding's dummy (n_cb[d]) to the shared dummy nC_max
            c[c == n_cb[d]] = nC_max
            AI[d, s], BI[d, s], CI[d, s] = a, b, c
            NCK[d, s] = -(-a_g.size // CHUNK)

    return _RingPlan(
        Ab=jnp.asarray(Ab, dtype=dtype), Bb=jnp.asarray(Bb, dtype=dtype),
        AI=jnp.asarray(AI), BI=jnp.asarray(BI), CI=jnp.asarray(CI),
        NCK=jnp.asarray(NCK),
        c_keys=c_keys_per_d, n_cb=n_cb, nC_max=nC_max, n_bc_C=n_bc_C,
        shape=(A.shape[0], B.shape[1]), a_split=a_split)


@partial(jax.jit, static_argnames=("mesh", "axis", "nC_max", "chunk"))
def _ring_bsp_numeric(Ab, Bb, AI, BI, CI, NCK, mesh: Mesh, axis: str,
                      nC_max: int, chunk: int = CHUNK):
    """Ring-rotate B block stacks; per step run the precomputed pair list
    against the resident stack. XLA's async collectives overlap the
    ppermute with the local contraction (the reference's Isend/Irecv +
    fast_mm overlap, setup_matmat.cpp:1986-2103). The inner loop's trip
    count is the per-(device, step) LIVE chunk count: no collective sits
    inside it, so devices may run different counts without deadlock, and
    band-structured operators skip the ring steps that carry no pairs."""
    D = mesh.devices.size

    def body(Ab, Bb, AI, BI, CI, NCK):
        Ab, Bb, AI, BI, CI, NCK = (
            Ab[0], Bb[0], AI[0], BI[0], CI[0], NCK[0])
        C = jnp.zeros((nC_max + 1, 8, 128), dtype=Ab.dtype)

        def step(s, carry):
            Bcur, C = carry

            def inner(t, C):
                sl = (jnp.int32(s), jnp.int32(t) * chunk)
                ai = jax.lax.dynamic_slice(AI, sl, (1, chunk))[0]
                bi = jax.lax.dynamic_slice(BI, sl, (1, chunk))[0]
                ci = jax.lax.dynamic_slice(CI, sl, (1, chunk))[0]
                prod = jnp.einsum(
                    "pik,pkj->pij", Ab[ai], Bcur[bi],
                    preferred_element_type=C.dtype,
                    precision=jax.lax.Precision.HIGHEST)
                return C.at[ci].add(prod)

            C = jax.lax.fori_loop(0, NCK[s], inner, C)
            Bnext = jax.lax.ppermute(
                Bcur, axis, perm=[(j, (j - 1) % D) for j in range(D)])
            return Bnext, C

        _, C = jax.lax.fori_loop(0, D, step, (Bb, C))
        return C[None]

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis),) * 6,
        out_specs=P(axis), check_vma=False,
    )(Ab, Bb, AI, BI, CI, NCK)


def matmat_sparse(A: sp.spmatrix, B: sp.spmatrix, mesh: Mesh,
                  axis: str = "d", dtype=jnp.float64, bk: int | None = None,
                  tol: float = 0.0, a_split=None, b_split=None) -> sp.csr_matrix:
    """Distributed block-sparse C = A @ B over the mesh ring. Peak device
    memory ∝ nonzero blocks of A, B, C per device — never O(n^2/D)."""
    from saena_tpu.parallel.partition import equal_row_split

    D = mesh.devices.size
    bk = bk or pick_bk(A, B)
    a_split = np.asarray(a_split) if a_split is not None \
        else equal_row_split(A.shape[0], D)
    b_split = np.asarray(b_split) if b_split is not None \
        else equal_row_split(B.shape[0], D)
    plan = _ring_plan(A, B, D, bk, a_split, b_split, dtype)
    C_dev = _ring_bsp_numeric(plan.Ab, plan.Bb, plan.AI, plan.BI, plan.CI,
                              plan.NCK, mesh, axis, plan.nC_max)
    C_np = np.asarray(C_dev)
    out = []
    for d in range(D):
        rows_d = int(a_split[d + 1] - a_split[d])
        out.append(_assemble_csr(C_np[d], plan.c_keys[d], plan.n_bc_C,
                                 (rows_d, B.shape[1]), tol))
    C = sp.vstack(out).tocsr()
    C.sum_duplicates()
    C.sort_indices()
    return C
