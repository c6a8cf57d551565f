"""Public API mirroring the reference's pImpl surface (saena.hpp:14-265):
``Matrix`` ~ saena::matrix, ``Vector`` ~ saena::vector, ``AMG`` ~ saena::amg,
with ``Options`` from saena_tpu.config ~ saena::options.

The reference's C++ classes wrap MPI-distributed objects; here Matrix wraps
host CSR assembly plus a device matrix, and AMG wraps hierarchy setup and the
jitted solvers. Multi-device execution is selected by passing a
``jax.sharding.Mesh`` (see saena_tpu.parallel)."""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from saena_tpu.config import Options
from saena_tpu.core.coo import CooBuilder, remove_boundary_nodes
from saena_tpu.io.readers import read_matrix, write_mtx, write_bin
from saena_tpu.ops.formats import device_matrix_from_csr, pad_to
from saena_tpu.vector import SaenaVector as Vector
from saena_tpu.amg import hierarchy as _hier
from saena_tpu.amg import solvers as _solvers
from saena_tpu.amg.galerkin import galerkin_product, filter_lump, filter_threshold
from saena_tpu.amg.eig import eig_max_invdiag_host


class Matrix:
    """saena::matrix analog. set()/assemble() state machine
    (ref saena_matrix_setup.cpp:4-18)."""

    def __init__(self, add_duplicates: bool = False):
        self._builder = CooBuilder(add_duplicates=add_duplicates)
        self._csr: Optional[sp.csr_matrix] = None
        self._device = None
        self._dtype = None
        self._assembled = False
        self.p_order = 1          # ref saena_matrix.h p_order (pcoarsening)
        self.prodim = 2

    # ---- ingest (ref saena.cpp:10-262 set overloads) ----
    def read_file(self, path: str) -> None:
        self._csr = read_matrix(path)
        self._assembled = False

    def set(self, rows, cols, vals) -> None:
        self._builder.set(rows, cols, vals)

    def set_csr(self, A: sp.spmatrix) -> None:
        self._csr = A.tocsr()
        self._assembled = False

    def add_duplicates(self, add: bool) -> None:
        self._builder.add_duplicates = add

    def set_p_order(self, p: int) -> None:
        self.p_order = p

    def set_prodim(self, d: int) -> None:
        self.prodim = d

    def assemble(self, scale: bool = False, use_dense: bool = False,
                 dtype=None) -> "Matrix":
        if self._csr is None or self._builder.nnz_buffered:
            if self._builder.nnz_buffered:
                self._csr = self._builder.assemble()
        if self._csr is None:
            raise ValueError("no entries/file set before assemble()")
        self._scale = scale
        self._use_dense = use_dense
        self._dtype = dtype or _hier.default_dtype()
        self._device = device_matrix_from_csr(
            self._csr, dtype=self._dtype,
            switch_to_dense=use_dense, dense_thre=0.0 if use_dense else 0.1,
            dense_sz_thre=1 << 30 if use_dense else 5000,
        )
        self._assembled = True
        return self

    def update_values(self, vals) -> None:
        """Replace the nonzero values, keeping the pattern (lazy-update
        ingredient, ref erase_lazy_update/matrix_setup_lazy_update)."""
        vals = np.asarray(vals)
        if self._csr is None or vals.shape != self._csr.data.shape:
            raise ValueError("pattern mismatch in update_values")
        self._csr.data[:] = vals
        if self._assembled:
            self.assemble(scale=getattr(self, "_scale", False),
                          use_dense=getattr(self, "_use_dense", False),
                          dtype=self._dtype)

    # ---- getters (ref saena.cpp getters) ----
    @property
    def csr(self) -> sp.csr_matrix:
        if self._csr is None:
            raise ValueError("assemble() first")
        return self._csr

    def get_num_rows(self) -> int:
        return self.csr.shape[0]

    def get_nnz(self) -> int:
        return int(self.csr.nnz)

    def get_internal_matrix(self):
        return self._device

    def matvec(self, v):
        if self._device is None:
            self.assemble()
        v = np.asarray(v)
        n = self.csr.shape[1]
        vp = jnp.asarray(np.pad(v, (0, pad_to(n) - n)), dtype=self._dtype)
        w = self._device.matvec(vp)
        return np.asarray(w)[: self.csr.shape[0]]

    # ---- io ----
    def writeMatrixToFile(self, path: str) -> None:
        if path.endswith(".bin"):
            write_bin(path, self.csr)
        else:
            write_mtx(path, self.csr)

    def erase(self) -> None:
        self._builder = CooBuilder(add_duplicates=self._builder.add_duplicates)
        self._csr = None
        self._device = None
        self._assembled = False

    destroy = erase


class AMG:
    """saena::amg analog (saena.hpp:195-265)."""

    def __init__(self):
        self.opts = Options()
        self.hierarchy: Optional[_hier.Hierarchy] = None
        self.info: Optional[_hier.SetupInfo] = None
        self.params: Optional[_hier.SolveParams] = None
        self._matrix: Optional[Matrix] = None
        self._rhs: Optional[np.ndarray] = None
        self._rhs_vector: Optional[Vector] = None
        self._bound = None       # boundary-removal bookkeeping
        self.verbose = False

    # ---- setup ----
    def set_matrix(self, A: Matrix, opts: Optional[Options] = None,
                   p_levels=None) -> "AMG":
        if opts is not None:
            self.opts = opts
        self._matrix = A
        csr = A.csr
        self._bound = None
        if self.opts.remove_boundary:
            Ai, interior, bound, bound_diag, _ = remove_boundary_nodes(csr)
            if bound.size:
                self._bound = (interior, bound, bound_diag, csr.shape[0])
                csr = Ai
        if self.opts.setup_shards:
            from saena_tpu.parallel.dist_setup import dist_setup

            self.hierarchy, self.info = dist_setup(
                csr, self.opts, n_shards=self.opts.setup_shards
                if self.opts.setup_shards > 0 else 0,
                use_dense=getattr(A, "_use_dense", False),
                p_levels=p_levels,
            )
        else:
            self.hierarchy, self.info = _hier.setup(
                csr, self.opts, use_dense=getattr(A, "_use_dense", False),
                p_levels=p_levels,
            )
        self.params = _hier.SolveParams.from_options(self.opts)
        if self.opts.verbose or self.verbose:
            print(self.info.table())
            if getattr(self.info, "comm", None) is not None:
                print(self.info.comm.table())  # setup wire volume per phase
        return self

    def set_rhs(self, rhs) -> "AMG":
        if isinstance(rhs, Vector):
            self._rhs_vector = rhs
            rhs = rhs.get_vec()
        self._rhs = np.asarray(rhs, dtype=np.float64)
        return self

    # ---- solves (each returns (u, SolveResult)) ----
    def _run(self, fn, u0=None, **kw):
        if self.hierarchy is None or self._rhs is None:
            raise ValueError("set_matrix() and set_rhs() first")
        rhs = self._rhs
        if self.opts.debug and not np.isfinite(rhs).all():
            raise FloatingPointError("rhs contains NaN/Inf")
        bound_sol = None
        if self._bound is not None:
            interior, bound, bound_diag, n_full = self._bound
            bound_sol = rhs[bound] / bound_diag
            rhs = rhs[interior]
        n = self.hierarchy.n
        rhs_p = np.pad(rhs, (0, self.hierarchy.n_pad - n))
        res = fn(self.hierarchy, rhs_p, params=self.params,
                 tol=kw.pop("tol", self.opts.tol),
                 max_iter=kw.pop("max_iter", self.opts.max_iter), **kw)
        u = np.asarray(res.u)[:n]
        if self._bound is not None:
            interior, bound, bound_diag, n_full = self._bound
            full = np.zeros(n_full)
            full[interior] = u
            full[bound] = bound_sol  # ref add_boundary_sol, saena_object.cpp:753
            u = full
        if self.opts.debug and not np.isfinite(u).all():
            raise FloatingPointError(
                f"solution contains NaN/Inf after {int(res.iters)} iterations "
                f"(init_res={float(res.init_res):.3e}); residual history: "
                f"{np.asarray(res.history)[:int(res.iters) + 1]}")
        return u, res

    def solve_pCG(self, **kw):
        return self._run(_solvers.solve_pCG, **kw)

    def solve(self, **kw):
        return self._run(_solvers.solve, **kw)

    def solve_CG(self, **kw):
        return self._run(_solvers.solve_CG, **kw)

    def solve_smoother(self, **kw):
        return self._run(_solvers.solve_smoother, **kw)

    def solve_GMRES(self, **kw):
        return self._run(_solvers.solve_GMRES, **kw)

    def solve_pGMRES(self, **kw):
        kw.setdefault("precondition", True)
        return self._run(_solvers.solve_GMRES, **kw)

    # ---- lazy updates (ref saena.hpp:236-241, saena_object_lazy.cpp) ----
    def _strip_boundary(self, csr):
        """Mirror set_matrix's boundary removal on a lazily-updated matrix:
        when the hierarchy was built with remove_boundary, the stored
        interior/bound index sets (pattern-only, so a same-pattern value
        refresh preserves them) slice the new FULL matrix down to the
        interior system and refresh the cached boundary diagonal (u_b =
        rhs_b / diag_b uses the NEW values). Without this, update1/2/3
        after a remove_boundary setup fed a full-size level 0 into an
        interior-sized hierarchy (caught by the round-5 verify drive)."""
        if self._bound is None:
            return csr
        interior, bound, bound_diag, n_full = self._bound
        if csr.shape[0] != n_full:
            return csr   # caller already passes an interior-sized matrix
        self._bound = (interior, bound, csr.diagonal()[bound], n_full)
        return csr[interior][:, interior].tocsr()

    def update1(self, A_new: Matrix) -> "AMG":
        """Replace only the finest-level values (same pattern)."""
        if self.info is None:
            raise ValueError("set_matrix() first")
        old = self._snapshot()
        self.info.csr_levels[0] = self._strip_boundary(A_new.csr)
        self._matrix = A_new
        self._redevicify(old)
        return self

    def update2(self, A_new: Matrix) -> "AMG":
        """Recompute every coarse operator through the EXISTING P/R."""
        if self.info is None:
            raise ValueError("set_matrix() first")
        old = self._snapshot()
        csr = self._strip_boundary(A_new.csr)
        levels = [csr]
        for l, (P, R) in enumerate(zip(self.info.Ps, self.info.Rs)):
            Ac = galerkin_product(R, levels[-1], P)
            thre = filter_threshold(l + 1, self.opts.filter_thre,
                                    self.opts.filter_max, self.opts.filter_start,
                                    self.opts.filter_rate)
            levels.append(filter_lump(Ac, thre))
        self.info.csr_levels = levels
        self._matrix = A_new
        self._redevicify(old)
        return self

    def update3(self, A_new: Matrix) -> "AMG":
        """Diff-propagating update (ref design: saena_object_lazy.cpp:
        1169-2316 local_diff + compute_coarsen_update_Ac): the sparse
        delta D = A_new - A_old is pushed through the EXISTING transfers,
        Ac += R D P per level. When only a few entries changed, each R D P
        is a product of tiny sparse operands — far cheaper than update2's
        full Galerkin recompute. Falls back to update2 when the pattern
        changed or most of the matrix did (diff nnz > 25% of A), matching
        the reference's intent that update3 serves LOCAL value changes.

        Semantics note (same as the reference): the per-level filter/lump
        is NOT re-applied to the propagated diff — coarse operators equal
        filter(R A_old P) + R D P, not filter(R A_new P). With
        filter_thre=0 the result is exactly update2's."""
        if self.info is None:
            raise ValueError("set_matrix() first")
        snap = self._snapshot()
        old = self.info.csr_levels[0]
        csr = self._strip_boundary(A_new.csr)
        if old.shape != csr.shape:
            return self.update2(A_new)
        D = (csr - old).tocsr()
        D.eliminate_zeros()
        if D.nnz == 0:
            return self
        if D.nnz > 0.25 * max(1, csr.nnz):
            return self.update2(A_new)
        levels = [csr]
        for P, R, Ac_old in zip(self.info.Ps, self.info.Rs,
                                self.info.csr_levels[1:]):
            D = (R @ D @ P).tocsr()
            Ac = (Ac_old + D).tocsr()
            Ac.sort_indices()
            levels.append(Ac)
        self.info.csr_levels = levels
        self._matrix = A_new
        self._redevicify(snap)
        return self

    def _snapshot(self):
        """(hierarchy, csrs, Ps, Rs) BEFORE an update mutates info — the
        reuse baseline for devicify's lazy fast path."""
        return (self.hierarchy, list(self.info.csr_levels),
                list(self.info.Ps), list(self.info.Rs))

    def _redevicify(self, old=None):
        """Rebuild device levels after a host-CSR refresh. With ``old`` (a
        _snapshot), devicify reuses unchanged levels wholesale and, for
        same-pattern value changes, the cached eigs, format plans, and P/R
        device objects — the ITER_LAZY design (ref saena_object.h:19):
        update1 at 48^3 re-ships one level's values instead of re-running
        per-level Lanczos and strip planning."""
        self.hierarchy, info = _hier.devicify(
            self.info.csr_levels, self.info.Ps, self.info.Rs, self.opts,
            reuse=old)
        info.thetas, info.coarsen_kinds = self.info.thetas, self.info.coarsen_kinds
        self.info = info

    # ---- misc parity surface ----
    def matrix_diff(self, A: Matrix, B: Matrix) -> float:
        d = (A.csr - B.csr)
        return float(np.abs(d.data).max()) if d.nnz else 0.0

    def matmat(self, A: Matrix, B: Matrix, mesh=None, mode: str = "auto",
               dtype=None) -> Matrix:
        """Standalone SpGEMM benchmark entry (ref saena::amg::matmat,
        saena.cpp:~930 -> setup_matmat.cpp:1164-1487 — the reference's
        distributed benchmark surface).

        With ``mesh`` (a jax.sharding.Mesh) the product runs on the DEVICE
        RINGS: the dense MXU ring or the block-sparse MXU ring, picked by
        operand density exactly like the reference's matmat_thre1 switch
        (``mode`` forces "dense"/"sparse"). Without a mesh it is the host
        scipy product (the serial fallback)."""
        C = Matrix()
        if mesh is not None:
            import jax

            from saena_tpu.ops.spgemm import matmat as device_matmat

            dt = dtype or (jnp.float64 if jax.config.jax_enable_x64
                           else jnp.float32)
            C.set_csr(device_matmat(A.csr, B.csr, mesh, dtype=dt,
                                    mode=mode).tocsr())
        else:
            C.set_csr((A.csr @ B.csr).tocsr())
        C.assemble()
        return C

    def profile_matvecs(self, n_iter: int = 20):
        """Per-level matvec timing (ref amg::profile_matvecs,
        saena_object.cpp:618-697)."""
        from saena_tpu.profiling import profile_matvecs

        if self.hierarchy is None:
            raise ValueError("set_matrix() first")
        return profile_matvecs(self.hierarchy, n_iter=n_iter)

    def profile_matvecs_breakdown(self, n_iter: int = 20):
        """V-cycle component breakdown (ref profile_matvecs_breakdown +
        print_vcycle_time)."""
        import numpy as np

        from saena_tpu.profiling import vcycle_breakdown

        if self.hierarchy is None:
            raise ValueError("set_matrix() first")
        rhs = np.zeros(self.hierarchy.n_pad)
        rhs[: self.hierarchy.n] = 1.0
        return vcycle_breakdown(self.hierarchy, self.params, rhs, n_iter=n_iter)

    def profile_trace(self, logdir: str, **kw):
        """Run one pCG solve under a jax.profiler trace (the rebuild of the
        reference's vendored `dollar` header profiler + print_time hooks,
        SURVEY.md §5): writes an XPlane/TensorBoard trace of the compiled
        solve to ``logdir`` and returns (u, SolveResult)."""
        import jax

        with jax.profiler.trace(logdir):
            out = self.solve_pCG(**kw)
        return out

    def solve_pCG_profile(self, **kw):
        """pCG solve + phase report (ref solve_pCG_profile,
        saena_object_solve.cpp:2804-3597): returns
        (u, SolveResult, breakdown dict). The breakdown carries the
        V-cycle component split (print_vcycle_time analog) plus
        ``pcg_phases`` — the per-ITERATION pCG split the reference's
        PROFILE_PCG accumulators report (precond apply / fine matvec /
        dot-axpy tail / full iteration / other)."""
        u, res = self.solve_pCG(**kw)
        bd = self.profile_matvecs_breakdown(n_iter=5)
        from saena_tpu.profiling import pcg_profile

        bd["pcg_phases"] = pcg_profile(self.hierarchy, self.params,
                                       n_iter=5)
        return u, res, bd

    def set_verbose(self, v: bool) -> None:
        self.verbose = v

    def set_multigrid_max_level(self, n: int) -> None:
        self.opts.max_level = n

    def set_scale(self, s: bool) -> None:
        self.opts.scale = s

    def set_sample_sz_percent(self, p: float) -> None:
        self.opts.sample_sz_percent = p

    def switch_to_dense(self, b: bool) -> None:
        self.opts.switch_to_dense = b

    def set_dense_threshold(self, thre: float, sz: int) -> None:
        self.opts.dense_thre = thre
        self.opts.dense_sz_thre = sz

    def set_shrink_levels(self, levels) -> None:
        """Which levels may shrink their active device subset (ref
        saena::amg::set_shrink_levels, saena.hpp:246). Applies to sharded
        solves (parallel.shard_hierarchy); the serial path has no devices to
        shrink. Empty = every level may shrink when the cost model says so."""
        self.opts.shrink_levels = tuple(bool(b) for b in levels)

    def set_shrink_values(self, values) -> None:
        """Per-level divisors of the active device count (ref
        set_shrink_values / cpu_shrink_thre2): entering level l the mesh
        subset shrinks by values[l] (0/1 = automatic decision)."""
        self.opts.shrink_values = tuple(int(v) for v in values)

    def switch_repart(self, val: bool = True) -> None:
        """Enable/disable the density-triggered equi-row partition switch
        (ref saena::amg::switch_repart, saena.cpp:717 ->
        saena_object.h:136). Takes effect on the next setup/shard."""
        self.opts.switch_repart = bool(val)

    def set_repart_thre(self, thre: float) -> None:
        """Density threshold for the equi-row switch (ref set_repart_thre,
        saena_object_repart_shrink.cpp:539)."""
        self.opts.repart_thre = float(thre)

    def destroy(self) -> None:
        self.hierarchy = None
        self.info = None
