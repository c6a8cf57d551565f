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

from saena_tpu.config import Options
from saena_tpu.api import Matrix, Vector, AMG
from saena_tpu import generators

__version__ = "0.1.0"
__all__ = ["Options", "Matrix", "Vector", "AMG", "generators"]
