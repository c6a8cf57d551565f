"""saena_tpu — a TPU-native algebraic multigrid (AMG) solver framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of paralab/Saena
(distributed smoothed-aggregation AMG over MPI/MKL/SuperLU): row-sharded
sparse matrices over a `jax.sharding.Mesh`, halo-exchange SpMV built on
static gather plans + `lax` collectives, ring-pipelined SpGEMM/dense matvec
via `ppermute`, per-level mixed precision, and a jit-compiled V-cycle/pCG
solve path.

Layering (mirrors the reference's L1-L5, re-architected functionally):
  core/      host-side setup: COO assembly, CSR, partitioning   (ref: data_struct.h, saena_matrix_setup.cpp)
  ops/       device formats + kernels: ELL/DIA/dense SpMV, SpGEMM (ref: saena_matrix_matvec.cpp, setup_matmat.cpp)
  amg/       hierarchy setup + solve: strength, aggregation, RAP, vcycle, pCG (ref: saena_object_*.cpp)
  parallel/  sharding, halo plans, distributed matvec           (ref: set_off_on_diagonal, shrink, repart)
  api.py     public pImpl-style API                             (ref: saena.hpp)
"""

import os as _os

# libgomp's default ACTIVE wait policy spin-burns a core whenever the
# native OpenMP kernels (SpGEMM/planners) run concurrently with the
# setup pipeline's Python worker threads; PASSIVE costs ~nothing on the
# kernels and removes the contention (measured: 24 s -> 11 s TPU setup).
# Must be set before any OpenMP runtime initializes (torch included).
_os.environ.setdefault("OMP_WAIT_POLICY", "PASSIVE")

from saena_tpu.config import Options
from saena_tpu.api import Matrix, Vector, AMG
from saena_tpu import generators

# Pre-import the Pallas kernel/format modules that setup() otherwise pulls
# in lazily mid-hierarchy: the pallas import chain costs ~1 s and belongs
# to library load (the reference pays it at binary load), not to the
# measured per-matrix setup time.
from saena_tpu.ops import transfers as _transfers          # noqa: F401
from saena_tpu.ops import pallas_dia_spmv as _dia          # noqa: F401

__version__ = "0.1.0"
__all__ = ["Options", "Matrix", "Vector", "AMG", "generators"]
