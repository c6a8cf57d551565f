"""Pallas ELL SpMV kernel.

The XLA lowering of the hybrid-ELL SpMV gathers x from HBM at ~1 element
per cycle, which makes mid-hierarchy (SA-coarsened, irregular) levels the
V-cycle bottleneck (measured 6.2 ms for an 829k-nnz level on v5e vs 7.6 us
for the DIA fine level). This kernel pins the WHOLE x vector in VMEM
(mid-level vectors are tens of KB; VMEM is ~16 MB) and performs the
per-element lookup with Mosaic's lane-wise ``tpu.dynamic_gather``
(`jnp.take_along_axis` on same-shape 2D operands), so gathers hit VMEM.

Mosaic constraint: operand and indices must share one 2D shape, gathering
along lanes. The kernel therefore processes ALL rows in one shot per
8-slot chunk — x is broadcast to (8, n_pad) and each chunk of the
slot-major cols is (8, n_pad). Row/column spaces are padded to a common
width for rectangular operands (P/R).

The reference's analog is the local CSR loop of matvec_sparse
(saena_matrix_matvec.cpp:68-80).

Applicability: (w_pad * n_pad) * 8 bytes + 3 copies of (8, n_pad) must fit
in VMEM — covers AMG mid/coarse levels (the sizes where XLA's gather hurts).
Fine stencil levels use the DIA path, which already runs at HBM roofline.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLOT_CHUNK = 8  # slots gathered per take_along_axis (sublane dim)
VMEM_BUDGET = 10 * 1024 * 1024


def _ell_spmv_kernel(x_ref, cols_ref, vals_ref, o_ref):
    # x_ref: (SLOT_CHUNK, n_pad) — x broadcast across sublanes
    # cols_ref/vals_ref: (w_pad, n_pad); o_ref: (1, n_pad)
    w_pad = cols_ref.shape[0]
    x = x_ref[:]
    acc = jnp.zeros((SLOT_CHUNK, o_ref.shape[1]), dtype=o_ref.dtype)
    for k in range(w_pad // SLOT_CHUNK):
        sl = slice(k * SLOT_CHUNK, (k + 1) * SLOT_CHUNK)
        idx = cols_ref[sl, :]                           # (8, n_pad)
        g = jnp.take_along_axis(x, idx, axis=1)         # lane gather (VMEM)
        acc = acc + vals_ref[sl, :] * g
    o_ref[0, :] = jnp.sum(acc, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ell_spmv_pallas(cols, vals, x, interpret: bool = False):
    """y = A @ x for slot-major ELL (w, n_rows_pad) with x VMEM-resident.
    cols/vals: (w, n_rows_pad); x: (n_cols_pad,). Returns (n_rows_pad,)."""
    w, n_rows_pad = cols.shape
    n_cols_pad = x.shape[0]
    n_pad = max(n_rows_pad, n_cols_pad)
    w_pad = ((w + SLOT_CHUNK - 1) // SLOT_CHUNK) * SLOT_CHUNK
    if w_pad != w or n_pad != n_rows_pad:
        cols = jnp.pad(cols, ((0, w_pad - w), (0, n_pad - n_rows_pad)))
        vals = jnp.pad(vals, ((0, w_pad - w), (0, n_pad - n_rows_pad)))
    xp = x.astype(vals.dtype)
    if n_pad != n_cols_pad:
        xp = jnp.pad(xp, (0, n_pad - n_cols_pad))
    x2 = jnp.broadcast_to(xp.reshape(1, -1), (SLOT_CHUNK, n_pad))
    out = pl.pallas_call(
        _ell_spmv_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), vals.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, cols, vals)
    return out[0, :n_rows_pad]


def pallas_spmv_supported(n_rows_pad: int, n_cols_pad: int, width: int,
                          dtype=jnp.float32) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    n_pad = max(n_rows_pad, n_cols_pad)
    w_pad = ((width + SLOT_CHUNK - 1) // SLOT_CHUNK) * SLOT_CHUNK
    need = w_pad * n_pad * (4 + itemsize) + 4 * SLOT_CHUNK * n_pad * itemsize
    return need < VMEM_BUDGET
