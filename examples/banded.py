#!/usr/bin/env python
"""Banded-matrix kernel driver (ref experiments/banded.cpp): SpMV and
smoother throughput on saena::band_matrix — config 2 of BASELINE.md.

Usage: python examples/banded.py [M [bandwidth]]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time
from functools import partial

import numpy as np

from saena_tpu import Matrix, Options, generators
from saena_tpu.amg import hierarchy as H
from saena_tpu.amg.smoothers import jacobi


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("M", nargs="?", type=int, default=100000)
    ap.add_argument("bandwidth", nargs="?", type=int, default=16)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    Acsr = generators.band_matrix(args.M, args.bandwidth)
    A = Matrix()
    A.set_csr(Acsr)
    A.assemble()
    dev = A.get_internal_matrix()
    print(f"band matrix: M={args.M} bw={args.bandwidth} nnz={Acsr.nnz} "
          f"format={type(dev).__name__}")

    from saena_tpu.ops.formats import pad_to
    n_pad = pad_to(args.M)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n_pad),
                    dtype=dev.dtype)

    @partial(jax.jit, static_argnames=("n",))
    def chain(Amat, v0, n):
        def body(i, v):
            w = Amat.matvec(v)
            return w / (1.0 + jnp.max(jnp.abs(w)))
        return jnp.sum(jax.lax.fori_loop(0, n, body, v0))

    float(chain(dev, x, n=5)); float(chain(dev, x, n=105))
    t0 = time.time(); float(chain(dev, x, n=5)); t5 = time.time() - t0
    t0 = time.time(); float(chain(dev, x, n=105)); t105 = time.time() - t0
    per = (t105 - t5) / 100
    print(f"SpMV: {per * 1e6:.2f} us -> {Acsr.nnz / per:.3e} nnz/s")

    # smoother throughput (jacobi sweeps, ref banded workload)
    diag = Acsr.diagonal()
    inv_d = jnp.asarray(np.pad(1.0 / diag, (0, n_pad - args.M)),
                        dtype=dev.dtype)

    @partial(jax.jit, static_argnames=("n",))
    def sm_chain(Amat, invd, rhs, n):
        def body(i, v):
            w = jacobi(Amat, invd, v, rhs, 1)
            return w / (1.0 + jnp.max(jnp.abs(w)))
        return jnp.sum(jax.lax.fori_loop(0, n, body, rhs))

    float(sm_chain(dev, inv_d, x, n=5)); float(sm_chain(dev, inv_d, x, n=105))
    t0 = time.time(); float(sm_chain(dev, inv_d, x, n=5)); t5 = time.time() - t0
    t0 = time.time(); float(sm_chain(dev, inv_d, x, n=105)); t105 = time.time() - t0
    per = (t105 - t5) / 100
    print(f"jacobi sweep: {per * 1e6:.2f} us")
    return 0


if __name__ == "__main__":
    sys.exit(main())
