"""Row-sharded matrices and the distributed AMG solve path.

TPU-native re-design of the reference's distributed layer:

- 1-D row partition (saena_matrix.h split[]) -> nnz-balanced ``split`` plus a
  blocked-padded vector layout over a ``jax.sharding.Mesh`` axis.
- Halo-exchange SpMV with comm/compute overlap (saena_matrix_matvec.cpp:9-113)
  -> ``ShardedEll``: static gather-pack + one ``all_to_all`` + fused local
  gather-SpMV (see halo.py); XLA's async collectives provide the overlap.
- Processor shrinking at coarse levels (saena_matrix_shrink.cpp) -> two
  mechanisms: (a) device-SUBSET sharding — comm-dominated levels re-balance
  their rows over a halved device subset (decide_shrinking :3-65 +
  shrink_cpu :167 analog; manual control via Options.shrink_levels/values =
  set_shrink_levels/values), inactive devices holding zero rows; and (b)
  ``replicate_threshold``: levels below it are REPLICATED across the mesh and
  reuse the serial Level kernels verbatim inside shard_map; the coarsest
  dense LU runs redundantly per device (the analog of shrinking to one rank
  + broadcast, shrink_cpu_c :67).
- repart_u / repart_back_u old->new coarse partition exchange (grid.cpp:3-163)
  -> the sharded->replicated transition: restriction is COLUMN-sharded so the
  coarse residual is one psum; prolongation is row-sharded against the
  replicated correction so it needs no collective at all.
- Distributed dots (aux_functions.h dotProduct) -> local vdot + psum.

Everything below runs inside ONE shard_map/jit region per solve: the entire
pCG + V-cycle loop compiles to a single XLA program with static shapes.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from saena_tpu.config import Options
from saena_tpu.ops.formats import pad_to, to_device
from saena_tpu.parallel.halo import HaloPlan, build_halo_plan
from saena_tpu.parallel.partition import nnz_balanced_split
from saena_tpu.amg.hierarchy import (
    Hierarchy,
    SolveParams,
    devicify,
    default_dtype,
)
from saena_tpu.amg.cycles import vcycle as serial_vcycle
from saena_tpu.amg.smoothers import jacobi, chebyshev


def _register(cls):
    data = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")]
    meta = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static")]
    jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)
    return cls


def _static(**kw):
    return dataclasses.field(metadata={"static": True}, **kw)


# ---------------------------------------------------------------------------
# sharded formats
# ---------------------------------------------------------------------------


@_register
@dataclasses.dataclass(frozen=True)
class ShardedEll:
    """Row-sharded slot-major ELL. Leading axis is the mesh axis; inside
    shard_map each device sees (1, width, n_rows_pad). Column ids are
    pre-remapped into the extended-local space built by ``plan.extend``."""

    cols: jax.Array              # (D, width, n_rows_pad) int32
    vals: jax.Array              # (D, width, n_rows_pad)
    plan: HaloPlan
    # COO spill for rows longer than the quantile width (hybrid ELL — the
    # sharded port of ops/formats.py ell_from_csr's skew handling, VERDICT
    # r1 #5): one Florida-style 5000-nnz row no longer multiplies the
    # (D, width, n_rows_pad) footprint. Zero-length when no spill.
    spill_rows: Optional[jax.Array] = None   # (D, S) int32 — local row ids
    spill_cols: Optional[jax.Array] = None   # (D, S) int32 — extended col ids
    spill_vals: Optional[jax.Array] = None   # (D, S)
    shape: tuple = _static(default=(0, 0))   # logical global (n_rows, n_cols)
    nnz: int = _static(default=0)
    reduce_rows: bool = _static(default=False)  # True: rows replicated, psum output

    @property
    def dtype(self):
        return self.vals.dtype

    def astype(self, dtype) -> "ShardedEll":
        return dataclasses.replace(
            self, vals=self.vals.astype(dtype),
            spill_vals=None if self.spill_vals is None
            else self.spill_vals.astype(dtype))

    def matvec(self, x_loc: jax.Array, exact: bool = False) -> jax.Array:
        """x_loc: local block of the column space (or the full replicated /
        extended vector, per plan.mode). Returns the local row block — or the
        replicated product when reduce_rows (column-sharded restriction)."""
        x_ext = self.plan.extend(x_loc.astype(self.dtype), exact=exact)
        g = jnp.take(x_ext, self.cols[0], axis=0)       # (width, n_rows_pad)
        y = jnp.sum(self.vals[0] * g, axis=0)
        if self.spill_rows is not None and self.spill_rows.shape[-1]:
            y = y.at[self.spill_rows[0]].add(
                self.spill_vals[0] * jnp.take(x_ext, self.spill_cols[0]))
        if self.reduce_rows:
            y = jax.lax.psum(y, self.plan.axis)
        return y


@_register
@dataclasses.dataclass(frozen=True)
class ShardedBsr:
    """Row-sharded (8,128)-block BSR with chunk-granular halo exchange:
    bcols reference the extended chunk space [local chunks | halo chunks]
    built by plan.extend_chunks. This carries the single-chip BSR speedup
    (512-byte block gathers + batched MXU products instead of scalar HBM
    gathers) onto the mesh, with halos moving as whole 128-value chunks."""

    blocks: jax.Array            # (D, n_br_loc, W, 8, 128)
    bcols: jax.Array             # (D, n_br_loc, W) int32 — extended chunk ids
    plan: HaloPlan
    shape: tuple = _static()
    nnz: int = _static()

    @property
    def dtype(self):
        return self.blocks.dtype

    def astype(self, dtype) -> "ShardedBsr":
        return dataclasses.replace(self, blocks=self.blocks.astype(dtype))

    def matvec(self, x_loc: jax.Array, exact: bool = False) -> jax.Array:
        ext = self.plan.extend_chunks(x_loc.astype(self.dtype), exact=exact)
        bcols = self.bcols[0]
        blocks = self.blocks[0]
        n_br, W = bcols.shape
        g = jnp.take(ext, bcols, axis=0)               # (n_br, W, 128)
        B = blocks.transpose(0, 2, 1, 3).reshape(n_br, 8, W * 128)
        y = jnp.einsum("rik,rk->ri", B, g.reshape(n_br, W * 128),
                       preferred_element_type=self.dtype)
        return y.reshape(-1)


@_register
@dataclasses.dataclass(frozen=True)
class ShardedStrip8:
    """Row-sharded multi-strip (strip8) gather SpMV: the fastest single-chip
    kernel for irregular mid-level operators (2-4x BSR measured) carried
    onto the mesh. Each device holds its row block's tiles with lane
    indices into the extended-local x ([local | halo] from the same
    element-granular plan as ShardedEll); all devices share one static
    (perrow, mode, n_tiles) geometry so shard_map traces once. Arbitrary
    row lengths pack into extra tiles — no ELL-style width padding, no
    spill path needed for skewed rows."""

    idx: jax.Array               # (D, n_tiles, 8, 128) int8
    vals: jax.Array              # (D, n_tiles, 8, 128)
    strips: jax.Array            # (D, n_tiles[*8]) int32
    gather_idx: jax.Array        # (D, n_rb, t_max) int32
    plan: HaloPlan
    shape: tuple = _static()
    nnz: int = _static()
    perrow: int = _static(default=1)
    mode: str = _static(default="general")
    n_cols_pad: int = _static(default=0)   # 128-mult extended-x length
    n_out: int = _static(default=0)        # per-device padded row count

    @property
    def dtype(self):
        return self.vals.dtype

    def astype(self, dtype) -> "ShardedStrip8":
        return dataclasses.replace(self, vals=self.vals.astype(dtype))

    def matvec(self, x_loc: jax.Array, exact: bool = False) -> jax.Array:
        from saena_tpu.ops.pallas_strip8_spmv import (
            Strip8Matrix, strip8_spmv, strip8_spmv_xla)

        cdt = jnp.promote_types(self.dtype, jnp.float32)
        x_ext = self.plan.extend(x_loc.astype(cdt), exact=exact)
        x_ext = jnp.pad(x_ext, (0, self.n_cols_pad - x_ext.shape[0]))
        M = Strip8Matrix(
            idx=self.idx[0], vals=self.vals[0], strips=self.strips[0],
            gather_idx=self.gather_idx[0],
            shape=(self.n_out, self.n_cols_pad), nnz=self.nnz,
            perrow=self.perrow, mode=self.mode, n_cols_pad=self.n_cols_pad,
            n_out=self.n_out)
        y = (strip8_spmv(M, x_ext) if jax.default_backend() == "tpu"
             else strip8_spmv_xla(M, x_ext))
        n_rows = y.shape[0]
        if n_rows < self.n_out:
            return jnp.pad(y, (0, self.n_out - n_rows))
        return y[: self.n_out]


@_register
@dataclasses.dataclass(frozen=True)
class ShardedDia:
    """Row-sharded DIA for banded/stencil operators over a 128-aligned
    EQUAL row split: every active device owns the same block height, so the
    blocked-padded global vector coincides with the real global vector and
    the diagonal offsets stay constant across blocks. The halo is then two
    CONTIGUOUS slabs — the tail of the left neighbor and the head of the
    right — moved by one ppermute each (the stencil specialization of the
    reference's vIndex halo, saena_matrix_matvec.cpp:9-113: for banded
    matrices vSend IS a contiguous boundary slab). The local block is a
    rectangular DIA over [left | own | right], which the Pallas kernel
    (ops/pallas_dia_spmv.py) streams at HBM rate; smoothers ride the fused
    one-pass update like the single-chip path."""

    data: jax.Array              # (D, ndiag, n_loc)
    shape: tuple = _static()     # logical global (n, n)
    nnz: int = _static()
    offsets: tuple = _static()   # GLOBAL diagonal offsets
    n_loc: int = _static()       # uniform per-device rows (multiple of 128)
    lo_pad: int = _static()      # left halo slab, multiple of 128
    hi_pad: int = _static()      # right halo slab, multiple of 128
    axis: str = _static(default="d")
    compress: str = _static(default="")

    @property
    def dtype(self):
        return self.data.dtype

    def astype(self, dtype) -> "ShardedDia":
        return dataclasses.replace(self, data=self.data.astype(dtype))

    def _extend(self, x_loc: jax.Array, exact: bool) -> jax.Array:
        """Halo slabs from up to k neighbors per side. Single-hop sends only
        the boundary slab; wider bands (lo/hi_pad > n_loc, VERDICT r1 #8)
        chain k ppermutes of whole blocks — device d accumulates the blocks
        of d-1..d-k (resp. d+1..d+k) and slices the needed slab. Devices
        near the domain edge receive zeros beyond it, preserving the
        zero-padding invariant."""
        D = jax.lax.psum(1, self.axis)

        def xfer(v, perm):
            """One compressed hop. Slabs and blocks are 128-multiples, so
            the int8_block codec applies directly; its power-of-2 scales
            make per-hop re-encoding idempotent (no error compounding on
            multi-hop chains)."""
            if self.compress == "int8_block" and not exact:
                from saena_tpu.parallel.halo import (int8_block_decode,
                                                     int8_block_encode)
                buf = jax.lax.ppermute(int8_block_encode(v), self.axis,
                                       perm=perm)
                return int8_block_decode(buf, x_loc.dtype)
            if self.compress and not exact:
                v = v.astype(jnp.dtype(self.compress))
            return jax.lax.ppermute(v, self.axis, perm=perm).astype(
                x_loc.dtype)

        def hops(send0, perm, k, take_tail):
            cur = send0
            blocks = []
            for _ in range(k):
                cur = xfer(cur, perm)
                blocks.append(cur)
            if k == 1:
                return blocks[0]
            cat = jnp.concatenate(blocks[::-1] if take_tail else blocks)
            return cat[-self.lo_pad:] if take_tail else cat[: self.hi_pad]

        parts = []
        if self.lo_pad:
            k = -(-self.lo_pad // self.n_loc)
            send = x_loc[-self.lo_pad:] if k == 1 else x_loc
            parts.append(hops(send, [(j, j + 1) for j in range(D - 1)],
                              k, take_tail=True))
        parts.append(x_loc)
        if self.hi_pad:
            k = -(-self.hi_pad // self.n_loc)
            send = x_loc[: self.hi_pad] if k == 1 else x_loc
            parts.append(hops(send, [(j, j - 1) for j in range(1, D)],
                              k, take_tail=False))
        return jnp.concatenate(parts) if len(parts) > 1 else x_loc

    def _ext_offsets(self) -> tuple:
        return tuple(int(o) + self.lo_pad for o in self.offsets)

    def matvec(self, x_loc: jax.Array, exact: bool = False) -> jax.Array:
        from saena_tpu.ops.pallas_dia_spmv import dia_supported

        # x/halo/accumulator at the COMPUTE dtype (>= f32): a bf16 twin
        # reduces only the streamed diagonals, same as single-chip DIA
        cdt = jnp.promote_types(self.dtype, jnp.float32)
        ext = self._extend(x_loc.astype(cdt), exact)
        offs = self._ext_offsets()
        if jax.default_backend() == "tpu" and \
                dia_supported(offs, self.n_loc, self.dtype, ext.shape[0]):
            from saena_tpu.ops.pallas_dia_spmv import _dia_call

            return _dia_call(self.data[0], ext, offs)
        return _dia_rect_xla(self.data[0], ext, offs)

    def fused_update(self, x_loc, rhs, dinv=None, c: float = 1.0,
                     add_x: bool = True):
        """[x +] c * [dinv *] (rhs - A x) with the halo exchange folded in
        front of the one-pass kernel (preconditioner path: lossy halo ok)."""
        from saena_tpu.ops.pallas_dia_spmv import (
            dia_fused_update, dia_supported)

        cdt = jnp.promote_types(self.dtype, jnp.float32)
        x_loc = x_loc.astype(cdt)
        ext = self._extend(x_loc, exact=False)
        offs = self._ext_offsets()
        if jax.default_backend() == "tpu" and \
                dia_supported(offs, self.n_loc, self.dtype, ext.shape[0]):
            return dia_fused_update(
                self.data[0], ext, rhs.astype(cdt), offs,
                dinv=None if dinv is None else dinv.astype(cdt),
                c=c, add_x=add_x, x_row0=self.lo_pad // 128)
        z = rhs.astype(cdt) - _dia_rect_xla(self.data[0], ext, offs)
        if dinv is not None:
            z = z * dinv.astype(cdt)
        if c != 1.0:
            z = z * c
        return x_loc + z if add_x else z


def _dia_rect_xla(data: jax.Array, x_ext: jax.Array, offsets) -> jax.Array:
    """XLA fallback for the rectangular DIA block: y[i] = sum_k
    data[k, i] * x_ext[i + off_k] with x_ext zero-extended. Accumulates at
    the compute dtype (>= f32) so bf16 twins only reduce the stream."""
    ndiag, n_loc = data.shape
    cdt = jnp.promote_types(data.dtype, jnp.float32)
    hi = max(0, max(offsets) + n_loc - x_ext.shape[0])
    xp = jnp.pad(x_ext.astype(cdt), (0, hi))
    y = jnp.zeros(n_loc, dtype=cdt)
    for k, off in enumerate(offsets):
        y = y + data[k].astype(cdt) * jax.lax.dynamic_slice(
            xp, (off,), (n_loc,))
    return y


@_register
@dataclasses.dataclass(frozen=True)
class ShardedDense:
    """Row-sharded dense block with a RING (systolic) matvec: x blocks
    rotate around the mesh via ppermute while each device multiplies its
    matching column panel — the direct analog of the reference's dense
    pipelined matvec (saena_matrix_dense.cpp:181-260), with XLA's async
    collectives overlapping the transfer with the MXU panel product."""

    data: jax.Array              # (D, n_loc_pad, D * n_loc_pad)
    shape: tuple = _static()
    nnz: int = _static()
    axis: str = _static(default="d")
    n_devices: int = _static(default=1)
    # compressed-ring payload (ref matvec_comp, saena_matrix_dense.cpp:262
    # ff. — the zfp fixed-rate ring): "int8_block" rotates the 129/128-byte
    # codec buffer (encoded ONCE; the codec is idempotent so multi-hop
    # rotation is lossless after the first quantization), a float name
    # rotates that cast. Preconditioner-only: exact=True bypasses.
    compress: str = _static(default="")

    @property
    def dtype(self):
        return self.data.dtype

    def astype(self, dtype) -> "ShardedDense":
        return dataclasses.replace(self, data=self.data.astype(dtype))

    def matvec(self, x_loc: jax.Array, exact: bool = False) -> jax.Array:
        A_loc = self.data[0]                     # (n_loc_pad, D*n_loc_pad)
        D = self.n_devices
        n_loc = x_loc.shape[0]
        my = jax.lax.axis_index(self.axis)
        x_loc = x_loc.astype(self.dtype)
        comp = self.compress if not exact else ""
        if comp == "int8_block":
            from saena_tpu.parallel.halo import (int8_block_decode,
                                                 int8_block_encode)
            enc = lambda v: int8_block_encode(v.astype(jnp.float32))
            dec = lambda b: int8_block_decode(b, self.dtype)
        elif comp:
            enc = lambda v: v.astype(jnp.dtype(comp))
            dec = lambda b: b.astype(self.dtype)
        else:
            enc = dec = lambda v: v

        perm = [(j, (j - 1) % D) for j in range(D)]

        def panel_at(e):
            return jax.lax.dynamic_slice(
                A_loc, (jnp.int32(0), e * jnp.int32(n_loc)),
                (A_loc.shape[0], n_loc))

        # own block first, EXACT — only the rotated (wire) blocks are
        # compressed, like the reference's matvec_comp which zfp-codes the
        # transfers and multiplies its own panel uncompressed
        y = jnp.dot(panel_at((my % D).astype(jnp.int32)), x_loc,
                    preferred_element_type=self.dtype)
        x_wire = enc(x_loc)

        def step(s, carry):
            x_cur, y = carry
            x_cur = jax.lax.ppermute(x_cur, self.axis, perm=perm)
            e = ((my + s) % D).astype(jnp.int32)
            y = y + jnp.dot(panel_at(e), dec(x_cur),
                            preferred_element_type=y.dtype)
            return x_cur, y

        _, y = jax.lax.fori_loop(1, D, step, (x_wire, y))
        return y


@_register
@dataclasses.dataclass(frozen=True)
class ShardedLevel:
    """One sharded grid level (analog of Grid over an active communicator)."""

    A: ShardedEll
    inv_diag: jax.Array           # (D, n_rows_pad)
    R_next: Optional[ShardedEll]  # to level lvl+1 (None on the last sharded level)
    P_next: Optional[ShardedEll]
    # reduced-precision smoother-operator copy (Options.smooth_dtype);
    # pCG's outer matvec always uses A with exact=True
    A_smooth: Optional[ShardedEll] = None
    n: int = _static(default=0)
    lvl: int = _static(default=0)
    eig_max: Optional[float] = _static(default=None)

    @property
    def dtype(self):
        return self.A.dtype

    def matvec(self, x, exact: bool = False):  # quacks like a serial Level.A
        return self.A.matvec(x, exact=exact)


@_register
@dataclasses.dataclass(frozen=True)
class _LevelView:
    """Per-device view of a ShardedLevel with the smoother interface."""

    A: ShardedEll
    inv_diag: jax.Array
    eig_max: Optional[float] = _static(default=None)


@_register
@dataclasses.dataclass(frozen=True)
class ShardedHierarchy:
    sharded: tuple                    # tuple[ShardedLevel, ...] (>= 1)
    trans_R: Optional[ShardedEll]     # column-sharded: last sharded -> first replicated
    trans_P: Optional[ShardedEll]     # row-sharded, direct vs replicated correction
    replicated: Optional[Hierarchy]   # serial tail (replicated on every device)
    d_active: tuple = _static(default=())  # active device count per sharded level
                                           # (the shrink trail; ref `active` flags)

    @property
    def n(self) -> int:
        return self.sharded[0].n

    @property
    def dtype(self):
        return self.sharded[0].dtype

    @property
    def axis(self) -> str:
        A = self.sharded[0].A
        return A.axis if hasattr(A, "axis") else A.plan.axis


# ---------------------------------------------------------------------------
# distributed vcycle + pCG (run INSIDE shard_map)
# ---------------------------------------------------------------------------


def _psmooth(level, params: SolveParams, u, rhs, iters: int,
             u_is_zero: bool = False):
    if iters <= 0:
        return u
    A = getattr(level, "A_smooth", None) or level.A
    inv_d = level.inv_diag[0]
    if params.smoother == "jacobi":
        return jacobi(A, inv_d, u, rhs, iters, params.jacobi_omega,
                      u_is_zero=u_is_zero)
    return chebyshev(A, inv_d, level.eig_max, u, rhs, iters,
                     u_is_zero=u_is_zero)


def sharded_vcycle(sh: ShardedHierarchy, params: SolveParams, u, rhs,
                   lvl: int = 0, u_is_zero: bool = True):
    levels = sh.sharded
    level = levels[lvl]
    last_sharded = lvl == len(levels) - 1

    u = _psmooth(level, params, u, rhs, params.preSmooth, u_is_zero=u_is_zero)
    # vectors stay in u's dtype; reduced-precision levels only reduce the
    # MATVEC (ref float_level semantics, saena_object.cpp:241-285)
    A_res = getattr(level, "A_smooth", None) or level.A
    res = A_res.matvec(u).astype(u.dtype) - rhs

    if not last_sharded:
        res_c = level.R_next.matvec(res).astype(u.dtype)
        e_c = sharded_vcycle(sh, params, jnp.zeros_like(res_c), res_c, lvl + 1)
        u = u - level.P_next.matvec(e_c).astype(u.dtype)
    else:
        # transition to the replicated tail: psum-reduced restriction,
        # serial vcycle on replicated data, collective-free prolongation.
        res_c = sh.trans_R.matvec(res).astype(u.dtype)      # replicated (n_c_pad,)
        e_c = serial_vcycle(sh.replicated, params,
                            jnp.zeros_like(res_c), res_c)
        u = u - sh.trans_P.matvec(e_c).astype(u.dtype)

    u = _psmooth(level, params, u, rhs, params.postSmooth)
    return u


def _pcg_body(sh: ShardedHierarchy, params: SolveParams, rhs, tol, max_iter: int):
    axis = sh.axis

    def pdot(a, b):
        return jax.lax.psum(jnp.vdot(a, b), axis)

    A = sh.sharded[0]
    u = jnp.zeros_like(rhs)
    r = A.matvec(u) - rhs
    init_dot = pdot(r, r)
    thr = init_dot * tol * tol
    hist = jnp.full(max_iter + 1, jnp.nan, dtype=rhs.dtype)
    hist = hist.at[0].set(jnp.sqrt(init_dot))

    rho = sharded_vcycle(sh, params, jnp.zeros_like(r), r)
    p = rho

    def cond(c):
        i, u, r, rho, p, rr, hist = c
        return (i < max_iter) & (rr >= thr)

    def body(c):
        i, u, r, rho, p, rr, hist = c
        h = A.matvec(p, exact=True)   # outer CG sees the exact operator
        rho_res = pdot(r, rho)
        pdoth = pdot(p, h)
        alpha = rho_res / pdoth
        u = u - alpha * p
        r = r - alpha * h
        replaced = jnp.asarray(False)
        if params.residual_replace > 0:
            replaced = (i + 1) % params.residual_replace == 0
            r = jax.lax.cond(replaced,
                             lambda _: A.matvec(u, exact=True) - rhs,
                             lambda _: r, None)
        rr_new = pdot(r, r)
        hist = hist.at[i + 1].set(jnp.sqrt(rr_new))

        def cont(_):
            rho2 = sharded_vcycle(sh, params, jnp.zeros_like(r), r)
            beta = jnp.where(replaced, 0.0, pdot(r, rho2) / rho_res)
            return rho2, rho2 + beta * p

        rho, p = jax.lax.cond(rr_new >= thr, cont, lambda _: (rho, p), None)
        return i + 1, u, r, rho, p, rr_new, hist

    i, u, r, rho, p, rr, hist = jax.lax.while_loop(
        cond, body, (0, u, r, rho, p, init_dot, hist))
    return u, i, jnp.sqrt(init_dot), jnp.sqrt(rr), hist


# ---------------------------------------------------------------------------
# setup: build a ShardedHierarchy from the host CSR hierarchy
# ---------------------------------------------------------------------------


def make_mesh(n_devices: Optional[int] = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devs)} exist")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _shard_csr_rows(A: sp.csr_matrix, split: np.ndarray, n_rows_pad: int,
                    width_quantile: float = 0.98):
    """Per-device row blocks: (cols_slotmajor, vals_slotmajor, spill,
    rowcols) with a COMMON width across devices (static shapes).

    Hybrid width (the sharded port of ell_from_csr's quantile+spill,
    VERDICT r1 #5): the slot-major width is cut at the GLOBAL row-nnz
    quantile and longer rows spill to per-device COO triples, so one
    skewed Florida-style row no longer inflates every device's block."""
    D = len(split) - 1
    A = A.tocsr()
    nnz_per_row = np.diff(A.indptr)
    if nnz_per_row.size == 0 or A.nnz == 0:
        width = 1
    elif width_quantile >= 1.0:
        width = int(nnz_per_row.max())
    else:
        width = max(1, int(np.quantile(nnz_per_row, width_quantile)))
        spill_cnt = int(np.maximum(nnz_per_row - width, 0).sum())
        if spill_cnt > 0.1 * A.nnz:       # don't spill more than ~10% of nnz
            width = int(nnz_per_row.max())
    blocks = [A[split[d]: split[d + 1]] for d in range(D)]

    cols = np.zeros((D, width, n_rows_pad), dtype=np.int64)
    vals = np.zeros((D, width, n_rows_pad), dtype=np.float64)
    sp_r, sp_c, sp_v = [], [], []
    rowcols = []
    for d, B in enumerate(blocks):
        nb = B.shape[0]
        cnt = np.diff(B.indptr)
        take = np.minimum(cnt, width)
        rows_idx = np.repeat(np.arange(nb), take)
        slot = _ranges(take)
        src = B.indptr[:-1].repeat(take) + slot
        cols[d, slot, rows_idx] = B.indices[src]
        vals[d, slot, rows_idx] = B.data[src]
        over = cnt - take
        s_src = (B.indptr[:-1] + take).repeat(over) + _ranges(over)
        sp_r.append(np.repeat(np.arange(nb), over).astype(np.int64))
        sp_c.append(B.indices[s_src].astype(np.int64))
        sp_v.append(B.data[s_src])
        rowcols.append(np.unique(B.indices))

    S = max(len(r) for r in sp_r) if sp_r else 0
    if S == 0:
        spill = None
    else:
        srows = np.zeros((D, S), dtype=np.int64)
        scols = np.zeros((D, S), dtype=np.int64)
        svals = np.zeros((D, S), dtype=np.float64)
        for d in range(D):
            k = len(sp_r[d])
            srows[d, :k] = sp_r[d]
            scols[d, :k] = sp_c[d]
            svals[d, :k] = sp_v[d]
        spill = (srows, scols, svals)
    return cols, vals, spill, rowcols, width


def _ranges(counts: np.ndarray) -> np.ndarray:
    counts = counts.astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ids = np.arange(total)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return ids - starts


def _remap_cols(cols: np.ndarray, vals: np.ndarray, remap) -> np.ndarray:
    """Apply the per-device global->extended-local remap, sending padding
    slots (val == 0) to index 0."""
    D = cols.shape[0]
    out = np.zeros(cols.shape, dtype=np.int32)
    for d in range(D):
        nz = vals[d] != 0
        flat = cols[d][nz]
        if flat.size:
            out[d][nz] = remap(d, flat)
    return out


def _build_sharded_ell(
    A: sp.csr_matrix,
    row_split: np.ndarray,
    col_split: np.ndarray,
    dtype,
    mode: str,
    axis: str,
    compress: str = "",
    reduce_rows: bool = False,
) -> ShardedEll:
    D = len(row_split) - 1
    n_rows_pad = pad_to(int(np.max(np.diff(row_split))) if D else 1)
    cols, vals, spill, rowcols, width = _shard_csr_rows(
        A, row_split, n_rows_pad)
    plan, remap = build_halo_plan(rowcols, col_split, mode=mode, axis=axis,
                                  compress=compress)
    if plan.send_idx.shape[0] != D:
        # keep the sharded leading axis consistent with the mesh size
        plan = dataclasses.replace(
            plan, send_idx=jnp.zeros((D, D, 1), dtype=jnp.int32))
    lcols = _remap_cols(cols, vals, remap)
    sr = sc = sv = None
    if spill is not None:
        srows, scols, svals = spill
        sc = _remap_cols(scols[:, None, :], svals[:, None, :], remap)[:, 0, :]
        sr = jnp.asarray(srows.astype(np.int32))
        sc = jnp.asarray(sc)
        sv = jnp.asarray(svals, dtype=dtype)
    return ShardedEll(
        cols=jnp.asarray(lcols),
        vals=jnp.asarray(vals, dtype=dtype),
        plan=plan,
        spill_rows=sr,
        spill_cols=sc,
        spill_vals=sv,
        shape=A.shape,
        nnz=int(A.nnz),
        reduce_rows=reduce_rows,
    )


def _build_sharded_bsr(
    A: sp.csr_matrix,
    row_split: np.ndarray,
    col_split: np.ndarray,
    dtype,
    mode: str,
    axis: str,
    compress: str = "",
) -> ShardedBsr:
    """Row-sharded BSR with a chunk-granular halo plan."""
    D = len(row_split) - 1
    n_rows_pad = pad_to(int(np.max(np.diff(row_split))))
    n_br = n_rows_pad // 8
    n_cols_loc_pad = pad_to(int(np.max(np.diff(col_split))))
    n_ch_loc = n_cols_loc_pad // 128
    A = A.tocsr()

    dev = []
    needed = [None] * D
    W = 1
    for d in range(D):
        blk = A[row_split[d]: row_split[d + 1]].tocoo()
        own = np.searchsorted(col_split, blk.col, side="right") - 1
        gch = own * n_ch_loc + (blk.col - col_split[own]) // 128
        br = blk.row // 8
        key = br.astype(np.int64) * (D * n_ch_loc) + gch
        uniq, inv = np.unique(key, return_inverse=True)
        u_br = uniq // (D * n_ch_loc)
        u_ch = uniq % (D * n_ch_loc)
        W = max(W, int(np.bincount(u_br, minlength=n_br).max()) if uniq.size else 1)
        needed[d] = np.unique(u_ch[(u_ch // n_ch_loc) != d])
        dev.append((blk, own, gch, br, uniq, inv, u_br, u_ch))

    if mode == "allgather":
        max_send = 0
        send_idx = np.zeros((D, D, 1), dtype=np.int32)
    else:
        max_send = max(1, max((len(n) for n in needed), default=1))
        send_idx = np.zeros((D, D, max_send), dtype=np.int32)
        for d in range(D):
            for e in range(D):
                if e == d:
                    continue
                need_de = needed[d][needed[d] // n_ch_loc == e]
                send_idx[e, d, : need_de.size] = (need_de - e * n_ch_loc).astype(np.int32)

    blocks = np.zeros((D, n_br, W, 8, 128))
    bcols = np.zeros((D, n_br, W), dtype=np.int32)
    for d in range(D):
        blk, own, gch, br, uniq, inv, u_br, u_ch = dev[d]
        if uniq.size == 0:
            continue
        # remap global chunk -> extended local chunk index
        if mode == "allgather":
            ext = u_ch.astype(np.int32)
        else:
            ext = np.empty(uniq.size, dtype=np.int32)
            local = (u_ch // n_ch_loc) == d
            ext[local] = (u_ch[local] - d * n_ch_loc).astype(np.int32)
            for e in range(D):
                if e == d:
                    continue
                need_de = needed[d][needed[d] // n_ch_loc == e]
                lut = {int(c): n_ch_loc + e * max_send + k
                       for k, c in enumerate(need_de)}
                sel = np.flatnonzero((u_ch // n_ch_loc) == e)
                for i in sel:
                    ext[i] = lut[int(u_ch[i])]
        # slot within block-row
        order = np.argsort(u_br, kind="stable")
        counts = np.bincount(u_br, minlength=n_br)
        starts = np.cumsum(counts) - counts
        slot = np.empty(uniq.size, dtype=np.int64)
        slot[order] = np.arange(uniq.size) - starts[u_br[order]]
        bcols[d, u_br, slot] = ext
        in_chunk = (blk.col - col_split[own]) % 128   # offset within the
        # owner's blocked-padded chunk (col % 128 would be wrong when the
        # owner's block doesn't start at a 128 boundary of the global ids)
        blocks[d, u_br[inv], slot[inv], blk.row % 8, in_chunk] = blk.data

    plan = HaloPlan(
        send_idx=jnp.asarray(send_idx), n_local=n_cols_loc_pad,
        max_send=max_send, mode=mode, axis=axis, compress=compress)
    return ShardedBsr(
        blocks=jnp.asarray(blocks, dtype=dtype), bcols=jnp.asarray(bcols),
        plan=plan, shape=A.shape, nnz=int(A.nnz))


def _sharded_bsr_bytes(A: sp.csr_matrix, row_split, col_split, dtype) -> int:
    D = len(row_split) - 1
    n_rows_pad = pad_to(int(np.max(np.diff(row_split))))
    n_br = n_rows_pad // 8
    n_ch_loc = pad_to(int(np.max(np.diff(col_split)))) // 128
    A = A.tocsr()
    W = 1
    for d in range(D):
        blk = A[row_split[d]: row_split[d + 1]].tocoo()
        if blk.nnz == 0:
            continue
        own = np.searchsorted(col_split, blk.col, side="right") - 1
        gch = own * n_ch_loc + (blk.col - col_split[own]) // 128
        key = (blk.row // 8).astype(np.int64) * (D * n_ch_loc) + gch
        u_br = np.unique(key) // (D * n_ch_loc)
        W = max(W, int(np.bincount(u_br, minlength=n_br).max()))
    import jax.numpy as _jnp

    return D * n_br * W * 8 * 128 * _jnp.dtype(dtype).itemsize


def _sharded_strip8_geometry(A: sp.csr_matrix, row_split, col_split, mode,
                             axis: str = "d", compress: str = ""):
    """Shared host prep for the sharded strip8 build/cost: per-device
    extended-local CSR blocks + the common (perrow, mode8) candidate with
    the smallest MAX per-device padded tile count (devices run in lockstep,
    so the slowest shard sets the kernel time). Returns None when no
    candidate plans (no native toolchain for interval mode is fine — the
    general numpy fallback always exists)."""
    from saena_tpu.ops.pallas_strip8_spmv import (
        GROUP8, _COST_GENERAL, _COST_INTERVAL, _PERROW8, _plan8_one)

    D = len(row_split) - 1
    n_rows_pad = pad_to(int(np.max(np.diff(row_split))) if D else 1)
    A = A.tocsr()
    blocks = []
    rowcols = []
    for d in range(D):
        B = A[row_split[d]: row_split[d + 1]]
        blocks.append(B)
        rowcols.append(np.unique(B.indices))
    # compress participates in the GEOMETRY: int8_block pads max_send, which
    # shifts every remote slot in the extended layout the tiles index into
    plan, remap = build_halo_plan(rowcols, col_split, mode=mode, axis=axis,
                                  compress=compress)
    if plan.mode == "allgather":
        ext_len = D * plan.n_local
    elif plan.mode == "direct":
        ext_len = pad_to(A.shape[1])
    else:
        ext_len = plan.n_local + D * plan.max_send
    n_cols_pad = pad_to(ext_len)
    # extended-local canonical CSR per device (rows padded to a COMMON
    # n_rows_pad so every shard's strip8 geometry is over the same shape)
    coos = []
    for d, B in enumerate(blocks):
        cols_ext = remap(d, B.indices) if B.nnz else \
            np.zeros(0, dtype=np.int32)
        indptr = np.concatenate(
            [B.indptr,
             np.full(n_rows_pad - B.shape[0], B.indptr[-1],
                     dtype=B.indptr.dtype)])
        Bx = sp.csr_matrix(
            (B.data, cols_ext.astype(np.int64), indptr),
            shape=(n_rows_pad, n_cols_pad))
        Bx.sort_indices()
        coos.append(Bx.tocoo())
    best = None
    for pr in _PERROW8:
        for m8, w in (("interval", _COST_INTERVAL), ("general",
                                                     _COST_GENERAL)):
            plans = []
            worst = 0
            for c in coos:
                p = _plan8_one(c, n_rows_pad, n_cols_pad, pr, m8)
                if p is None:
                    plans = None
                    break
                plans.append(p)
                nt = max(GROUP8, -(-p[3].shape[0] // GROUP8) * GROUP8)
                worst = max(worst, nt)
            if plans is None:
                continue
            cost = worst * w
            if best is None or cost < best[0]:
                best = (cost, pr, m8, plans, worst)
    if best is None:
        return None
    _, pr, m8, plans, worst_tiles = best
    return (blocks, coos, plans, plan, n_rows_pad, n_cols_pad, pr, m8,
            worst_tiles)


def sharded_strip8_time(A: sp.csr_matrix, row_split, col_split,
                        mode: str = "exchange") -> float:
    """Modeled per-matvec seconds for the sharded strip8 kernel (slowest
    shard's tiles x the measured ns/tile); inf when not plannable."""
    from saena_tpu.ops.pallas_strip8_spmv import STRIP8_NS_PER_TILE

    geo = _sharded_strip8_geometry(A, row_split, col_split, mode)
    if geo is None:
        return float("inf")
    return geo[8] * STRIP8_NS_PER_TILE[geo[7]] * 1e-9


def _build_sharded_strip8(A, row_split, col_split, dtype, mode, axis,
                          compress: str = "") -> ShardedStrip8:
    from saena_tpu.ops.pallas_strip8_spmv import GROUP8

    geo = _sharded_strip8_geometry(A, row_split, col_split, mode,
                                   axis=axis, compress=compress)
    if geo is None:
        raise ValueError("sharded strip8: no plannable layout")
    blocks, coos, plans, plan, n_rows_pad, n_cols_pad, pr, m8, _ = geo
    D = len(row_split) - 1
    if plan.send_idx.shape[0] != D:
        plan = dataclasses.replace(
            plan, send_idx=jnp.zeros((D, D, 1), dtype=jnp.int32))

    Q = 128 // pr
    n_rb = n_rows_pad // Q
    n_tiles_pad = GROUP8
    t_max = 1
    for p in plans:
        nt = max(GROUP8, -(-p[3].shape[0] // GROUP8) * GROUP8)
        n_tiles_pad = max(n_tiles_pad, nt)
        t_max = max(t_max, int(p[4].max()) if p[4].size else 1)

    idx = np.zeros((D, n_tiles_pad, 8, 128), dtype=np.int8)
    vals = np.zeros((D, n_tiles_pad, 8, 128), dtype=np.float64)
    strips = np.zeros(
        (D, n_tiles_pad if m8 == "interval" else n_tiles_pad * 8),
        dtype=np.int32)
    gather_idx = np.full((D, n_rb, t_max), n_tiles_pad, dtype=np.int32)
    for d in range(D):
        coo = coos[d]
        e_tile, e_sub, e_krem, tile_strips, rb_tiles = plans[d][:5]
        n_tiles = tile_strips.shape[0]
        if n_tiles:
            if m8 == "interval":
                strips[d, :n_tiles] = tile_strips
            else:
                strips[d, : n_tiles * 8] = tile_strips.reshape(-1)
            lane = e_krem.astype(np.int64) * Q + coo.row % Q
            idx[d, e_tile, e_sub, lane] = coo.col % 128
            vals[d, e_tile, e_sub, lane] = coo.data
        off = np.cumsum(rb_tiles) - rb_tiles
        for t in range(t_max):
            m = rb_tiles > t
            gather_idx[d, m, t] = off[m] + t

    return ShardedStrip8(
        idx=jnp.asarray(idx), vals=to_device(vals, dtype),
        strips=jnp.asarray(strips), gather_idx=jnp.asarray(gather_idx),
        plan=plan, shape=A.shape, nnz=int(A.nnz), perrow=pr, mode=m8,
        n_cols_pad=n_cols_pad, n_out=n_rows_pad)


def sharded_dia_plan(A: sp.csr_matrix, D: int, d_active: int, dtype,
                     dia_fill_thre: float = 0.3):
    """Eligibility + geometry for ShardedDia: returns (split, n_loc, lo_pad,
    hi_pad, offsets) or None. Requires a banded/stencil operator (bounded
    diagonal count at decent fill), single-hop halos (slab <= block), and a
    Pallas-compatible extended block."""
    from saena_tpu.ops.formats import dia_offsets_of
    from saena_tpu.ops.pallas_dia_spmv import dia_supported

    n = A.shape[0]
    if A.shape[0] != A.shape[1] or A.nnz == 0 or d_active < 2:
        return None
    offs = dia_offsets_of(A)
    if offs.size > 256 or A.nnz / (offs.size * n) < dia_fill_thre:
        return None
    n_loc = pad_to(-(-n // d_active))
    lo = max(0, -int(offs.min()))
    hi = max(0, int(offs.max()))
    lo_pad, hi_pad = pad_to(lo), pad_to(hi)
    # multi-hop halos (k chained ppermutes) cover bands wider than one
    # block; past half the domain the operator is effectively dense
    if lo_pad > (d_active - 1) * n_loc or hi_pad > (d_active - 1) * n_loc:
        return None
    offsets = tuple(int(o) for o in offs)
    ext_len = lo_pad + n_loc + hi_pad
    if not dia_supported(tuple(o + lo_pad for o in offsets), n_loc,
                         dtype, ext_len):
        return None
    split = np.minimum(np.arange(D + 1) * n_loc, n)
    split[d_active:] = n
    return split, n_loc, lo_pad, hi_pad, offsets


def _build_sharded_dia(A: sp.csr_matrix, plan, dtype, axis: str,
                       D: int, compress: str = "") -> "ShardedDia":
    """Per-device DIA blocks in extended-local coordinates. The equal
    128-multiple block height makes the blocked-padded global layout equal
    to the real global vector (zero tail on the last active device only),
    so data[d][k][i] = A[r0+i, r0+i+off_k] directly."""
    split, n_loc, lo_pad, hi_pad, offsets = plan
    n = A.shape[0]
    coo = A.tocoo()
    offs = np.asarray(offsets)
    k_of = np.searchsorted(offs, coo.col.astype(np.int64) - coo.row)
    data = np.zeros((D, len(offsets), n_loc))
    d_of = coo.row // n_loc
    i_loc = coo.row % n_loc
    np.add.at(data, (d_of, k_of, i_loc), coo.data)
    return ShardedDia(
        data=jnp.asarray(data, dtype=dtype),
        shape=A.shape, nnz=int(A.nnz), offsets=offsets,
        n_loc=n_loc, lo_pad=lo_pad, hi_pad=hi_pad,
        axis=axis, compress=compress,
    )


def _sharded_operator(A, row_split, col_split, dtype, mode, axis,
                      compress="", fmt="auto"):
    """Dispatch ShardedStrip8 / ShardedBsr / ShardedEll for a sharded
    operator. "auto" on accelerator backends ranks strip8 vs BSR by
    MODELED MATVEC TIME (same discipline as the single-chip
    pick_gather_format; the strip kernels are op-bound, BSR stream-bound,
    so bytes alone mis-rank them); CPU keeps ELL (scalar gather is cheap
    there, and tests pin formats explicitly)."""
    if fmt == "strip8":
        return _build_sharded_strip8(A, row_split, col_split, dtype, mode,
                                     axis, compress=compress)
    use_bsr = fmt == "bsr"
    use_s8 = False
    if fmt == "auto":
        import jax as _jax

        if _jax.default_backend() != "cpu" and A.nnz > 0:
            from saena_tpu.ops.formats import (BSR_STREAM_BPS,
                                               BSR_TIME_FACTOR)

            est = _sharded_bsr_bytes(A, row_split, col_split, dtype)
            bsr_ok = est <= 768 * 1024 * 1024 and est <= 1024 * A.nnz
            t_bsr = (est / len(row_split[:-1]) / BSR_STREAM_BPS
                     * BSR_TIME_FACTOR) if bsr_ok else float("inf")
            t_s8 = sharded_strip8_time(A, row_split, col_split, mode)
            use_s8 = t_s8 < t_bsr
            use_bsr = bsr_ok and not use_s8
    if use_s8:
        return _build_sharded_strip8(A, row_split, col_split, dtype, mode,
                                     axis, compress=compress)
    if use_bsr:
        return _build_sharded_bsr(A, row_split, col_split, dtype, mode, axis,
                                  compress=compress)
    return _build_sharded_ell(A, row_split, col_split, dtype, mode, axis,
                              compress=compress)


def _build_sharded_dense(A: sp.csr_matrix, split: np.ndarray, dtype,
                         axis: str, D: int,
                         compress: str = "") -> ShardedDense:
    """Dense row blocks over the blocked-padded column layout, for the ring
    matvec (the reference's generate_dense_matrix + dense matvec analog).
    ``compress`` enables the compressed rotating-x ring (matvec_comp)."""
    n_loc_pad = pad_to(int(np.max(np.diff(split))))
    data = np.zeros((D, n_loc_pad, D * n_loc_pad))
    Ac = A.tocsr()
    for d in range(D):
        blk = Ac[split[d]: split[d + 1]].tocoo()
        own = np.searchsorted(split, blk.col, side="right") - 1
        cc = own * n_loc_pad + (blk.col - split[own])
        data[d][blk.row, cc] = blk.data
    return ShardedDense(
        data=jnp.asarray(data, dtype=dtype), shape=A.shape, nnz=int(A.nnz),
        axis=axis, n_devices=D, compress=compress)


def _col_sharded_restriction(
    R: sp.csr_matrix, fine_split: np.ndarray, dtype, axis: str,
) -> ShardedEll:
    """R split by fine COLUMNS: device d holds R[:, fine block d] over ALL
    coarse rows; the products psum to the replicated coarse vector."""
    D = len(fine_split) - 1
    n_c = R.shape[0]
    n_c_pad = pad_to(n_c)
    Rcsc = R.tocsc()
    width = 1
    pieces = []
    for d in range(D):
        piece = Rcsc[:, fine_split[d]: fine_split[d + 1]].tocsr()
        pieces.append(piece)
        if piece.nnz:
            width = max(width, int(np.diff(piece.indptr).max()))
    cols = np.zeros((D, width, n_c_pad), dtype=np.int32)
    vals = np.zeros((D, width, n_c_pad), dtype=np.float64)
    for d, piece in enumerate(pieces):
        cnt = np.diff(piece.indptr)
        rows_idx = np.repeat(np.arange(n_c), cnt)
        slot = _ranges(cnt)
        cols[d, slot, rows_idx] = piece.indices   # already local fine indices
        vals[d, slot, rows_idx] = piece.data
    plan = HaloPlan(
        send_idx=jnp.zeros((D, D, 1), dtype=jnp.int32),
        n_local=pad_to(int(np.max(np.diff(fine_split)))),
        max_send=0, mode="direct", axis=axis,
    )
    return ShardedEll(
        cols=jnp.asarray(cols), vals=jnp.asarray(vals, dtype=dtype),
        plan=plan, shape=R.shape, nnz=int(R.nnz), reduce_rows=True,
    )


def halo_comm_work_ratio(A: sp.csr_matrix, split: np.ndarray) -> float:
    """Static comm/compute cost model for one sharded level: the worst
    device's halo volume (unique remote columns it must receive) relative
    to its local nnz. The reference measures this with timed dummy matvecs
    (decide_shrinking, saena_matrix_shrink.cpp:3-65: comm > 2x compute ->
    shrink); counts are a deterministic stand-in with the same decision
    structure."""
    D = len(split) - 1
    worst = 0.0
    A = A.tocsr()
    for d in range(D):
        blk = A[split[d]: split[d + 1]]
        if blk.nnz == 0:
            continue
        cols = np.unique(blk.indices)
        remote = np.sum((cols < split[d]) | (cols >= split[d + 1]))
        worst = max(worst, float(remote) / blk.nnz)
    return worst


def measured_shrink_time(A: sp.csr_matrix, split: np.ndarray, dtype,
                         mode: str, mesh: Mesh, axis: str = "d",
                         n_iter: int = 24) -> float:
    """Seconds per sharded dummy matvec of ``A`` under ``split`` on the
    mesh — the measured leg of the shrink decision (ref decide_shrinking's
    matrix_setup_dummy + matvec_dummy timing, saena_matrix_shrink.cpp:3-65,
    455-531). Builds a throwaway sharded operator, runs a chained jitted
    matvec loop inside shard_map, and times it by the two-length value-
    fetch slope (block_until_ready does not synchronize on the tunnel)."""
    import time as _time

    from jax.sharding import PartitionSpec as P

    Ash = _sharded_operator(A, split, split, dtype, mode, axis)
    n_rows = pad_to(int(np.max(np.diff(split))))
    D = mesh.devices.size

    @partial(jax.jit, static_argnames=("n",))
    def chain(Ash, x, n):
        def body(A_loc, x_loc):
            def it(i, v):
                w = A_loc.matvec(v)
                return w / (1.0 + jnp.max(jnp.abs(w)))
            return jnp.sum(jax.lax.fori_loop(0, n, it, x_loc[0]))[None]

        s = jax.shard_map(
            body, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(axis), Ash), P(axis)),
            out_specs=P(axis), check_vma=False)(Ash, x)
        return jnp.sum(s)

    x = jnp.ones((D, n_rows), dtype=Ash.dtype)
    n_short = 3
    n_long = n_short + n_iter
    float(chain(Ash, x, n_short))      # compile + first-exec upload
    float(chain(Ash, x, n_long))
    reps = []
    for _ in range(3):
        t0 = _time.perf_counter()
        float(chain(Ash, x, n_short))
        ts = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        float(chain(Ash, x, n_long))
        tl = _time.perf_counter() - t0
        reps.append((tl - ts) / (n_long - n_short))
    return max(1e-9, float(np.median(reps)))


def shard_hierarchy(
    info,                      # SetupInfo from amg.hierarchy.setup (host CSRs)
    opts: Options,
    mesh: Mesh,
    dtype=None,
    eigs: Optional[list] = None,
    sharded_format: str = "auto",   # "auto" | "ell" | "bsr" | "dia" | "strip8"
) -> ShardedHierarchy:
    """Partition the fine levels of a host hierarchy across the mesh; levels
    with global size < opts.replicate_threshold — or whose halo volume
    dominates local work (the decide_shrinking analog) — form the
    replicated tail."""
    axis = mesh.axis_names[0]
    D = mesh.devices.size
    dtype = dtype or default_dtype()
    low_dtype = jnp.dtype(opts.low_dtype)
    csr_levels, Ps, Rs = info.csr_levels, info.Ps, info.Rs
    n_lv = len(csr_levels)

    # Per-level splits with device-subset SHRINKING (the processor-shrinking
    # analog, saena_matrix_shrink.cpp): when a level's halo volume dominates
    # its local work (decide_shrinking's comm > 2x compute test, :3-65), the
    # active device count halves — the level's rows re-balance over the
    # leading devices and the rest hold zero rows (shrink_cpu :167). Manual
    # factors via opts.shrink_values/shrink_levels (ref set_shrink_*) take
    # precedence. Shrinking all the way to one device ends the sharded
    # prefix: the replicated tail IS the one-device analog (shrink_cpu_c).
    def _may_shrink(l: int) -> bool:
        return (not opts.shrink_levels
                or (l < len(opts.shrink_levels) and bool(opts.shrink_levels[l])))

    def _manual_factor(l: int):
        if l < len(opts.shrink_values):
            f = int(opts.shrink_values[l] or 0)
            if f > 1:
                return f
        return None

    from saena_tpu.parallel.partition import subset_split as _subset_split

    def subset_split(A, D, d):
        return _subset_split(A, D, d, opts.repart_thre, opts.switch_repart)

    n_sharded = 0
    splits = []
    d_active = []
    dia_plans = []
    d_act = D
    for l, A in enumerate(csr_levels):
        if A.shape[0] < opts.replicate_threshold or l >= n_lv - 1:
            break
        if l > 0 and _may_shrink(l):
            fac = _manual_factor(l)
            if fac is not None:
                d_act = max(1, d_act // fac)
            elif opts.shrink_measure:
                # measured decision: time a dummy sharded matvec at the
                # current subset and at half of it, keep the faster (the
                # reference's actual decide_shrinking semantics); on any
                # failure fall back to the static ratio
                try:
                    dt_l = low_dtype if (opts.float_storage and
                                         l >= opts.float_level) else dtype
                    cands = [d_act] + ([d_act // 2] if d_act > 1 else [])
                    times = {
                        d: measured_shrink_time(
                            A, subset_split(A, D, d), dt_l,
                            opts.halo_mode, mesh, axis)
                        for d in cands}
                    d_act = min(times, key=times.get)
                except Exception:
                    if opts.shrink_comm_ratio > 0:
                        while d_act > 1 and halo_comm_work_ratio(
                                A, subset_split(A, D, d_act)) \
                                > opts.shrink_comm_ratio:
                            d_act //= 2
            elif opts.shrink_comm_ratio > 0:
                while d_act > 1 and halo_comm_work_ratio(
                        A, subset_split(A, D, d_act)) > opts.shrink_comm_ratio:
                    d_act //= 2
            if d_act <= 1:
                break  # fully shrunk -> replicated tail from here down
        # banded/stencil levels take the DIA fast path (Pallas kernel +
        # contiguous-slab ppermute halo), which needs a 128-aligned EQUAL
        # split over the active devices; others keep the nnz-balanced split
        dia_plan = None
        if sharded_format in ("auto", "dia"):
            dt_l = low_dtype if (opts.float_storage and
                                 l >= opts.float_level) else dtype
            dia_plan = sharded_dia_plan(A, D, d_act, dt_l)
        dia_plans.append(dia_plan)
        splits.append(dia_plan[0] if dia_plan is not None
                      else subset_split(A, D, d_act))
        d_active.append(d_act)
        n_sharded += 1
    if n_sharded == 0:  # always shard the finest level
        n_sharded = 1
        splits = [nnz_balanced_split(csr_levels[0], D,
                                     opts.repart_thre, opts.switch_repart)]
        d_active = [D]
        dia_plans = [None]

    compress = opts.halo_dtype if opts.compress_halo else ""
    mode = opts.halo_mode

    def _level_compress(l: int, dt) -> str:
        # float_level's REFERENCE semantics: levels >= it ship their halo
        # payloads at low_dtype (the vSend_f/MPI_FLOAT wire of
        # matvec_sparse_float, saena_matrix_matvec.cpp:448-520) while local
        # values stay at the level dtype. An explicit compress_halo wins;
        # no-op when the wire dtype would not actually shrink the payload.
        if compress:
            return compress
        if l >= opts.float_level and \
                jnp.dtype(low_dtype).itemsize < jnp.dtype(dt).itemsize:
            return str(jnp.dtype(low_dtype))
        return ""

    from saena_tpu.amg.eig import eig_max_invdiag_host

    sharded_levels = []
    for l in range(n_sharded):
        A = csr_levels[l]
        dt = low_dtype if (opts.float_storage and
                           l >= opts.float_level) else dtype
        comp_l = _level_compress(l, dt)
        density = A.nnz / max(1, A.shape[0] ** 2)
        if (opts.switch_to_dense and l > 0 and density > opts.dense_thre
                and A.shape[0] <= opts.dense_sz_thre):
            Ash = _build_sharded_dense(A, splits[l], dt, axis, D,
                                       compress=comp_l)
        elif dia_plans[l] is not None:
            Ash = _build_sharded_dia(A, dia_plans[l], dt, axis, D,
                                     compress=comp_l)
        else:
            Ash = _sharded_operator(A, splits[l], splits[l], dt, mode, axis,
                                    compress=comp_l, fmt=sharded_format)
        n_rows_pad = pad_to(int(np.max(np.diff(splits[l]))))
        inv_d = np.zeros((D, n_rows_pad))
        diag = A.diagonal()
        for d in range(D):
            blk = diag[splits[l][d]: splits[l][d + 1]]
            safe = np.where(blk == 0, 1.0, blk)
            inv_d[d, : blk.size] = np.where(blk != 0, 1.0 / safe, 0.0)

        eig = None
        if opts.smoother == "chebyshev":
            eig = (eigs[l] if eigs and l < len(eigs) and eigs[l] is not None
                   else float(eig_max_invdiag_host(A)))

        R_next = P_next = None
        if l + 1 < n_sharded:
            dt_next = low_dtype if (opts.float_storage and
                                    (l + 1) >= opts.float_level) else dtype
            comp_next = _level_compress(l + 1, dt_next)
            # R: rows on coarse split, columns in fine split space
            R_next = _sharded_operator(Rs[l], splits[l + 1], splits[l],
                                       dt_next, mode, axis,
                                       compress=comp_next,
                                       fmt=sharded_format)
            # P: rows on fine split, columns in coarse split space
            P_next = _sharded_operator(Ps[l], splits[l], splits[l + 1],
                                       dt_next, mode, axis,
                                       compress=comp_next,
                                       fmt=sharded_format)

        A_smooth = None
        if opts.smooth_dtype:
            sm_dt = jnp.dtype(opts.smooth_dtype)
            keep = sm_dt != jnp.dtype(dt) and hasattr(Ash, "astype")
            if keep and type(Ash).__name__ == "ShardedDia":
                # keep the twin only where the DIA kernel streams it
                # (f32/bf16 data); other dtypes would silently fall off
                # the Pallas path — same policy as single-chip ret_dia
                from saena_tpu.ops.pallas_dia_spmv import dia_supported

                ext_len = Ash.lo_pad + Ash.n_loc + Ash.hi_pad
                keep = dia_supported(
                    tuple(o + Ash.lo_pad for o in Ash.offsets),
                    Ash.n_loc, sm_dt, ext_len)
            if keep:
                A_smooth = Ash.astype(sm_dt)

        sharded_levels.append(
            # inv_diag carries the VECTOR dtype (matvec-only mixed precision)
            ShardedLevel(A=Ash, inv_diag=jnp.asarray(inv_d, dtype=dtype),
                         R_next=R_next, P_next=P_next, A_smooth=A_smooth,
                         n=A.shape[0], lvl=l, eig_max=eig)
        )

    # transition + replicated tail
    trans_R = trans_P = None
    replicated = None
    if n_sharded < n_lv:
        lt = n_sharded - 1  # transition uses P/R of the last sharded level
        dt_next = low_dtype if (lt + 1) >= opts.float_level else dtype
        trans_R = _col_sharded_restriction(Rs[lt], splits[lt], dt_next, axis)
        # P rows on fine split, correction replicated -> direct cols into the
        # coarse PLAIN padded indexing
        n_c = Ps[lt].shape[1]
        trans_P = _build_sharded_ell(
            Ps[lt], splits[lt], np.asarray([0, n_c]), dt_next, "direct", axis)

        tail_opts = dataclasses.replace(
            opts, float_level=max(0, opts.float_level - n_sharded))
        # the tail's VECTOR dtype stays full precision; operators below
        # float_level still devicify reduced (matvec-only mixed precision)
        replicated, _ = devicify(
            csr_levels[n_sharded:], Ps[n_sharded:], Rs[n_sharded:],
            tail_opts, dtype=dtype,
        )
    else:
        raise NotImplementedError(
            "fully-sharded hierarchy without a replicated tail: lower "
            "replicate_threshold so at least the coarsest level replicates")

    return ShardedHierarchy(
        sharded=tuple(sharded_levels),
        trans_R=trans_R, trans_P=trans_P, replicated=replicated,
        d_active=tuple(d_active),
    ), splits


# ---------------------------------------------------------------------------
# host-facing solve
# ---------------------------------------------------------------------------


def update_sharded_values(sh_old: "ShardedHierarchy", info, opts: Options,
                          mesh: Mesh, dtype=None,
                          sharded_format: str = "auto"):
    """Values-only refresh of a sharded hierarchy (the sharded leg of the
    lazy-update path, VERDICT r3 #8): rebuild from the updated host CSRs
    while REUSING the old hierarchy's per-level eig estimates (same
    pattern — re-Lanczos skipped) and the planning memos that the serial
    update path transferred onto the new CSR objects (splits, strip/strip8
    geometry, BSR block maps re-derive from those cached plans). Returns
    (sh_new, splits)."""
    eigs = [lv.eig_max for lv in sh_old.sharded]
    return shard_hierarchy(info, opts, mesh, dtype=dtype, eigs=eigs,
                           sharded_format=sharded_format)


def blocked_pad_vector(v: np.ndarray, split: np.ndarray) -> np.ndarray:
    """Plain (n,) host vector -> blocked-padded (D, n_loc_pad)."""
    D = len(split) - 1
    n_loc_pad = pad_to(int(np.max(np.diff(split))))
    out = np.zeros((D, n_loc_pad), dtype=v.dtype)
    for d in range(D):
        blk = v[split[d]: split[d + 1]]
        out[d, : blk.size] = blk
    return out


def unblock_vector(vb: np.ndarray, split: np.ndarray) -> np.ndarray:
    D = len(split) - 1
    parts = [vb[d, : split[d + 1] - split[d]] for d in range(D)]
    return np.concatenate(parts)


@partial(jax.jit, static_argnames=("params", "max_iter", "mesh"))
def _sharded_pcg_jit(sh: ShardedHierarchy, params, rhs_blocked, tol,
                     max_iter: int, mesh: Mesh):
    axis = sh.axis

    def body(sh_loc, rhs_loc):
        u, i, r0, rfin, hist = _pcg_body(
            sh_loc, params, rhs_loc[0], tol, max_iter)
        return u[None], i, r0, rfin, hist

    spec_sh = jax.tree.map(lambda _: P(axis), sh)
    # replicated tail + transition output cols are replicated arrays
    sh_specs = dataclasses.replace(
        spec_sh,
        replicated=jax.tree.map(lambda _: P(), sh.replicated),
    )
    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(sh_specs, P(axis)),
        out_specs=(P(axis), P(), P(), P(), P()),
        check_vma=False,
    )(sh, rhs_blocked)
    return out


def sharded_solve_pCG(sh: ShardedHierarchy, splits, rhs: np.ndarray,
                      mesh: Mesh, params: Optional[SolveParams] = None,
                      tol: float = 1e-8, max_iter: int = 100):
    """Host entry: plain rhs in, plain solution out."""
    params = params or SolveParams()
    dtype = sh.dtype
    rhs_b = jnp.asarray(blocked_pad_vector(np.asarray(rhs), splits[0]),
                        dtype=dtype)
    u_b, iters, r0, rfin, hist = _sharded_pcg_jit(
        sh, params, rhs_b, jnp.asarray(tol, dtype), max_iter, mesh)
    u = unblock_vector(np.asarray(u_b), splits[0])
    return u, int(iters), float(r0), float(rfin), np.asarray(hist)
