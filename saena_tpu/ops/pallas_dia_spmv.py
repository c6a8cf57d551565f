"""Pallas DIA (stencil) SpMV — single-pass, x resident in VMEM.

The XLA lowering of the DIA matvec (sum of dynamically-sliced shifted
products, formats.py:DiaMatrix.matvec) re-streams the shifted x slice from
HBM for every diagonal: ~(2*ndiag + 2) * 4 bytes/row plus a padded copy of
x, measured 33.3 us on the 48^3 Poisson fine level (7 diagonals, n=97k,
~21% of the v5e HBM roofline). This kernel brings the traffic down to the
information-theoretic minimum for DIA:

    read data (ndiag * 4 B/row) + read x once (4 B/row) + write y (4 B/row)

by keeping x entirely in VMEM across the row-tile grid and serving every
shifted view from a halo-padded VMEM scratch built once at grid step 0
(a VMEM->VMEM copy — no HBM pad traffic). A shift by ``off`` elements on
the (rows, 128) 2-D layout decomposes as q, r = divmod(off, 128): rows
move by q and lanes rotate by r across adjacent rows, expressed as two
static-lane-width slices concatenated on the lane axis — all VPU work,
no gathers (the reference's hot loop is the CSR local multiply,
saena_matrix_matvec.cpp:68-80; DIA is its gather-free TPU replacement
for stencil operators).

Applicability: DIA matrices whose x fits VMEM next to the data tiles
(n up to ~1.4M rows at f32 in ONE call). Larger operators are row-PANELLED
(dia_panels): each panel is a rectangular kernel call whose x window is the
panel's band reach [p0-lo, p0+bp+hi) — the same trick a sharded row block
uses, applied within one chip — so multi-million-row stencils stay on the
Pallas path instead of falling to the XLA lowering (measured 17.5 Gnnz/s
at 2M rows vs ~170 on the kernel). Falls back to the XLA path only when
even panelling fails (dia_supported). The kernel is RECTANGULAR-capable
(y rows != x length): a sharded row block reading the halo-extended local
vector passes offsets shifted into extended coordinates
(parallel/sharded.py ShardedDia).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
VMEM_BUDGET = 12 * 2**20   # leave headroom under the ~16 MB core VMEM


def _vmem_need(ndiag, R, Rp, tr, isz=4):
    # x + halo scratch resident (always f32), double-buffered data tiles at
    # the DATA itemsize plus f32 rhs/dinv/y tiles
    return (4 * (R * LANES + Rp * LANES)
            + 2 * (ndiag * isz + 3 * 4) * tr * LANES)


def _plan(offsets, n_pad, m_pad=None, isz=4):
    """Static geometry: (Rx, grid, lo128, Rp, tile_rows). tile_rows adapts
    to the diagonal count so wide stencils (Galerkin coarse operators have
    ~100 diagonals) still fit their data tiles in VMEM. m_pad allows a
    RECTANGULAR operator (y rows = n_pad, x length = m_pad): row i reads
    x[i + off] in x's coordinates — the sharded row-block case, where x is
    the halo-extended local vector. isz = data itemsize (bf16 twins stream
    2 B/diag/row; sub-4-byte data needs tile_rows >= 16 for sublane
    packing, which every candidate already satisfies)."""
    Ry = n_pad // LANES
    Rx = (m_pad if m_pad is not None else n_pad) // LANES
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    lo128 = -(-lo // LANES)
    hi128 = -(-hi // LANES)
    ndiag = len(offsets)
    tr = 8 if isz >= 4 else 16
    for cand in (512, 256, 128, 64, 32, 16):
        g = -(-Ry // cand)
        rp = lo128 + max(Rx, g * cand + hi128) + 1
        if _vmem_need(ndiag, Rx, rp, cand, isz) <= VMEM_BUDGET:
            tr = cand
            break
    grid = -(-Ry // tr)
    # worst in-kernel read: base + q + tr rows, base <= (grid-1)*tr,
    # q <= lo128 + hi128  =>  Rp covers it (and all of x) with a spare row
    Rp = lo128 + max(Rx, grid * tr + hi128) + 1
    return Rx, grid, lo128, Rp, tr


def _whole_supported(offsets, n_pad, dtype, m_pad=None) -> bool:
    """Single-call gate: f32 or bf16 DATA (x/accumulator/output stay f32 —
    the dynamic shifted loads are from the f32 VMEM scratch, so bf16 data
    never hits Mosaic's dynamic-bf16-row limitation) and VMEM-resident x."""
    dt = jnp.dtype(dtype)
    if dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)) \
            or n_pad % LANES:
        return False
    if m_pad is not None and m_pad % LANES:
        return False
    isz = dt.itemsize
    Rx, grid, lo128, Rp, tr = _plan(offsets, n_pad, m_pad, isz)
    return _vmem_need(len(offsets), Rx, Rp, tr, isz) <= VMEM_BUDGET


@functools.lru_cache(maxsize=512)
def dia_panels(offsets, n_pad, dtype_name):
    """Row-panel decomposition for SQUARE operators whose x exceeds the
    VMEM budget: panels of bp rows, each a rectangular kernel call reading
    the x window [w0, w1) that covers the panel's band reach. Offsets are
    rebased into window coordinates (off + p0 - w0); p0 and w0 are 128-
    aligned so the fused-update x-add lands on x_row0 = (p0-w0)/128 rows
    of the window scratch. Returns a tuple of
    (p0, bp, w0, wlen, offs_window, x_row0) or None."""
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    Ry = n_pad // LANES
    for npanel in (2, 4, 8, 16, 32):
        # panel starts are multiples of 512 tiles so every tile-rows
        # candidate in _plan divides the start: the kernel then reads
        # data/rhs/dinv straight out of the FULL arrays via BlockSpec
        # index offsets — no per-matvec panel copies of the data array
        btiles = -(-(-(-Ry // npanel)) // 512) * 512
        bp = btiles * LANES
        panels = []
        ok = True
        for p0 in range(0, n_pad, bp):
            bpi = min(bp, n_pad - p0)
            w0 = max(0, (p0 - lo) // LANES * LANES)
            w1 = min(n_pad, -(-(p0 + bpi + hi) // LANES) * LANES)
            offs = tuple(off + p0 - w0 for off in offsets)
            if not _whole_supported(offs, bpi, dtype_name, m_pad=w1 - w0):
                ok = False
                break
            panels.append((p0, bpi, w0, w1 - w0, offs, (p0 - w0) // LANES))
        if ok and len(panels) > 1:
            return tuple(panels)
    return None


def dia_supported(offsets, n_pad, dtype, m_pad=None) -> bool:
    """Trace-time gate for the Pallas path: a single VMEM-resident-x call,
    or (square case) a row-panel decomposition (dia_panels)."""
    if _whole_supported(offsets, n_pad, dtype, m_pad):
        return True
    if m_pad is None:
        dt = jnp.dtype(dtype)
        if dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)) \
                or n_pad % LANES:
            return False
        return dia_panels(tuple(offsets), n_pad, dt.name) is not None
    return False


def _kernel(*refs, offsets, Rx, lo128, tr, x_row0, c, add_x, has_rhs,
            has_dinv):
    # refs: x, data, [rhs], [dinv], y, xp  (optional tiles in that order)
    x_ref, data_ref = refs[0], refs[1]
    pos = 2
    rhs_ref = dinv_ref = None
    if has_rhs:
        rhs_ref = refs[pos]; pos += 1
    if has_dinv:
        dinv_ref = refs[pos]; pos += 1
    y_ref, xp = refs[pos], refs[pos + 1]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # lo128/tail are static; Mosaic rejects zero-sized vector writes
        # (panelled calls rebase offsets so interior panels have lo128 == 0)
        if lo128:
            xp[0:lo128, :] = jnp.zeros((lo128, LANES), x_ref.dtype)
        xp[pl.ds(lo128, Rx), :] = x_ref[:]
        tail = xp.shape[0] - lo128 - Rx
        if tail:
            xp[pl.ds(lo128 + Rx, tail), :] = jnp.zeros((tail, LANES),
                                                       x_ref.dtype)

    base = i * tr
    acc = jnp.zeros((tr, LANES), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1)
    for k, off in enumerate(offsets):
        q, r = divmod(lo128 * LANES + off, LANES)
        if r == 0:
            sh = xp[pl.ds(base + q, tr), :]
        else:
            # one LANE-ALIGNED (tr+1)-row window + a single lane roll +
            # select: lanes < 128-r come from row i, the wrap from row
            # i+1. Replaces two sub-lane-sliced loads + a lane concat
            # (Mosaic lowers those to shift/select chains per operand).
            # Measured on the 48^3 headline SpMV: f32 4.12 -> 2.65 us
            # (162 -> 253 Gnnz/s), bf16 3.40 -> 2.39 — the kernel moves
            # from rotation-op bound toward the diagonal stream floor,
            # which finally lets the bf16 twin's halved stream pay.
            # (cyclic) left-roll by r == right-roll by LANES - r; pltpu
            # rejects negative shifts
            W = pltpu.roll(xp[pl.ds(base + q, tr + 1), :], LANES - r, 1)
            sh = jnp.where(lane < LANES - r, W[0:tr, :], W[1:tr + 1, :])
        acc = acc + data_ref[k].astype(jnp.float32) * sh

    if has_rhs:                         # z = c * [dinv *] (rhs - A x)
        z = rhs_ref[:] - acc
        if has_dinv:
            z = z * dinv_ref[:]
        if c != 1.0:
            z = z * c
        if add_x:                       # smoother update: x rows are already
            # resident in the halo scratch — the add costs no HBM traffic
            z = z + xp[pl.ds(base + lo128 + x_row0, tr), :]
        y_ref[:] = z
    else:
        y_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("offsets", "c", "add_x", "x_row0",
                                    "p0", "bp", "interpret"))
def _dia_call(data, x, offsets, rhs=None, dinv=None, c=1.0, add_x=False,
              x_row0=0, p0=0, bp=None, interpret=False):
    """One kernel call over output rows [p0, p0 + bp) of the FULL data /
    rhs / dinv arrays (p0=0, bp=None: all rows). Panel calls pass the
    full arrays and a 128*tr-aligned p0 so the BlockSpec index maps read
    the panel straight out of HBM — only the x window is a sliced copy."""
    ndiag, n_total = data.shape
    n_pad = bp if bp is not None else n_total
    m_pad = x.shape[0]
    isz = jnp.dtype(data.dtype).itemsize
    Rx, grid, lo128, Rp, tr = _plan(offsets, n_pad, m_pad, isz)
    assert p0 % (tr * LANES) == 0, (p0, tr)
    t0 = p0 // (tr * LANES)
    tile = lambda: pl.BlockSpec((tr, LANES), lambda i: (t0 + i, 0),
                                memory_space=pltpu.VMEM)
    Ry = n_pad // LANES
    Ryt = n_total // LANES
    in_specs = [
        pl.BlockSpec((Rx, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ndiag, tr, LANES), lambda i: (0, t0 + i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x.reshape(Rx, LANES), data.reshape(ndiag, Ryt, LANES)]
    if rhs is not None:
        in_specs.append(tile()); args.append(rhs.reshape(Ryt, LANES))
    if dinv is not None:
        in_specs.append(tile()); args.append(dinv.reshape(Ryt, LANES))
    y2d = pl.pallas_call(
        functools.partial(
            _kernel, offsets=tuple(offsets), Rx=Rx, lo128=lo128, tr=tr,
            x_row0=x_row0, c=c, add_x=add_x, has_rhs=rhs is not None,
            has_dinv=dinv is not None),
        out_shape=jax.ShapeDtypeStruct((Ry, LANES), jnp.float32),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tr, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Rp, LANES), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * n_pad,
            bytes_accessed=(ndiag * isz + 8) * n_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return y2d.reshape(n_pad)


def dia_spmv(data: jax.Array, x: jax.Array, offsets: tuple,
             interpret: bool = False) -> jax.Array:
    """y = A @ x for DIA storage data[k, i] = A[i, i + offsets[k]].

    data: (ndiag, n_pad) f32, zero where out of range; x: (n_pad,) f32
    zero-padded. Preserves zero padding (padded rows have all-zero data).
    Square operators beyond the one-call VMEM budget run as row panels
    (dia_panels) — each panel reads only its band window of x.
    """
    offsets = tuple(offsets)
    n_pad = data.shape[1]
    if _whole_supported(offsets, n_pad, data.dtype):
        return _dia_call(data, x, offsets, interpret=interpret)
    panels = dia_panels(offsets, n_pad, jnp.dtype(data.dtype).name)
    ys = [
        _dia_call(data, jax.lax.slice(x, (w0,), (w0 + wlen,)), offs,
                  p0=p0, bp=bp, interpret=interpret)
        for (p0, bp, w0, wlen, offs, _) in panels
    ]
    return jnp.concatenate(ys)


def dia_fused_update(data, x, rhs, offsets, dinv=None, c: float = 1.0,
                     add_x: bool = True, x_row0: int = 0,
                     interpret: bool = False):
    """One-kernel smoother/residual step:

        y = [x +] c * [dinv *] (rhs - A @ x)

    add_x=True, dinv, c=omega  -> a full Jacobi sweep (saena_matrix.cpp:1044)
    add_x=False, dinv, c=d2    -> the Chebyshev scaled residual (:1074)
    add_x=False, no dinv, c=1  -> plain residual rhs - A u

    The x-add reads the rows from the VMEM halo scratch, so the whole
    update costs the same HBM traffic as one matvec plus the rhs/dinv
    streams — one pass instead of two or three.

    x may be LONGER than rhs (the halo-extended local vector of a sharded
    row block); x_row0 gives the 128-row offset of the block's own rows
    inside x so add_x reads the right slice. Square operators beyond the
    one-call VMEM budget run as row panels (dia_panels; x_row0 must be 0 —
    the panel decomposition derives its own window offsets)."""
    offsets = tuple(offsets)
    n_pad = data.shape[1]
    if _whole_supported(offsets, n_pad, data.dtype,
                        m_pad=x.shape[0] if x.shape[0] != n_pad else None):
        return _dia_call(data, x, offsets, rhs=rhs, dinv=dinv, c=float(c),
                         add_x=add_x, x_row0=int(x_row0),
                         interpret=interpret)
    assert x.shape[0] == n_pad and x_row0 == 0, \
        "panelled fused update supports the square case only"
    panels = dia_panels(offsets, n_pad, jnp.dtype(data.dtype).name)
    ys = [
        _dia_call(data, jax.lax.slice(x, (w0,), (w0 + wlen,)), offs,
                  rhs=rhs, dinv=dinv, c=float(c), add_x=add_x, x_row0=xr0,
                  p0=p0, bp=bp, interpret=interpret)
        for (p0, bp, w0, wlen, offs, xr0) in panels
    ]
    return jnp.concatenate(ys)
