"""AMG hierarchy: host-side setup producing a device-resident Level pytree.

Functional split (the TPU-native re-design of saena_object::setup,
saena_object.cpp:175-406): all irregular, data-dependent work — strength,
aggregation, Galerkin products, format selection — runs once on the host
with numpy/scipy; the output is a tuple of static-shape ``Level`` pytrees
(ELL/DIA/dense blocks, inverse diagonals, cached coarse LU factors) that the
jitted V-cycle/pCG consume. Setup cost is amortized exactly like the
reference's (assemble once, solve many; SuperLU factors cached —
solve.cpp:922-926 — here the dense LU of the coarsest level is cached).
"""
from __future__ import annotations

import dataclasses
import threading
import time
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from saena_tpu.config import Options
from saena_tpu.ops.formats import (
    DeviceMatrix,
    EllMatrix,
    dense_from_csr,
    device_matrix_from_csr,
    ell_from_csr,
    pad_to,
    to_device,
)
from saena_tpu.amg.strength import find_aggregation
from saena_tpu.amg.prolongation import smoothed_prolongator, restriction
from saena_tpu.amg.galerkin import (
    galerkin_product,
    filter_lump,
    filter_threshold,
    sparsify_majid,
)
from saena_tpu.amg.eig import eig_max_invdiag_host


def _register(cls):
    data = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")]
    meta = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static")]
    jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)
    return cls


def _static(**kw):
    return dataclasses.field(metadata={"static": True}, **kw)


@_register
@dataclasses.dataclass(frozen=True)
class Level:
    """One grid level. P/R transfer to the NEXT (coarser) level and are None
    on the coarsest. (ref Grid, grid.h:11-78)"""

    A: DeviceMatrix
    inv_diag: jax.Array                      # (n_pad,)
    P: Optional[DeviceMatrix]                # (n, n_coarse) — ELL or BSR
    R: Optional[DeviceMatrix]                # (n_coarse, n)
    # optional reduced-precision operator copy for V-cycle-internal
    # smoother/residual matvecs (Options.smooth_dtype); the outer Krylov
    # always uses A
    A_smooth: Optional[DeviceMatrix] = None
    n: int = _static(default=0)              # logical size
    lvl: int = _static(default=0)
    eig_max: Optional[float] = _static(default=None)  # lambda_max(D^{-1}A)*1.0001

    @property
    def n_pad(self) -> int:
        return self.inv_diag.shape[0]

    @property
    def dtype(self):
        # the level's VECTOR dtype; the operator (self.A.dtype) may be
        # reduced on levels >= float_level (matvec-only mixed precision)
        return self.inv_diag.dtype


@_register
@dataclasses.dataclass(frozen=True)
class CoarseLU:
    """Cached dense direct solver for the coarsest operator (replaces
    SuperLU_DIST's cached pdgssvx factorization, solve.cpp:117-420, 793-958).

    Two apply strategies:
    - ``inv`` (small n, the default): the inverse is computed ONCE on the
      host in f64 and applied as a single tiny MXU matmul plus one
      iterative-refinement matmul pair. TPU's ``triangular_solve`` is a
      sequential row sweep (~0.5 ms even at n=36, dominating the V-cycle);
      the matmul apply is ~10 us. Padding rows/cols of ``inv`` and
      ``adense`` are ZERO so the solve preserves zero padding.
    - ``lu`` (large n): on-device LU factors + lu_solve, the padded tail
      carrying a unit diagonal so the factorization stays nonsingular.
    """

    lu: Optional[jax.Array]
    piv: Optional[jax.Array]
    inv: Optional[jax.Array]
    adense: Optional[jax.Array]
    n: int = _static()

    def solve(self, rhs: jax.Array) -> jax.Array:
        if self.inv is not None:
            x = self.inv @ rhs.astype(self.inv.dtype)
            # one refinement step: kills the kappa*eps error of the
            # explicit-inverse apply at the cost of two more tiny matmuls
            r = rhs.astype(self.inv.dtype) - self.adense @ x
            return x + self.inv @ r
        x = jax.scipy.linalg.lu_solve((self.lu, self.piv), rhs.astype(self.lu.dtype))
        return x


@_register
@dataclasses.dataclass(frozen=True)
class Hierarchy:
    levels: tuple                            # tuple[Level, ...]
    coarse_lu: Optional[CoarseLU]
    inv_sq_diag: Optional[jax.Array]         # D^{-1/2} of the FINEST level when scaled

    @property
    def n_levels(self) -> int:
        return len(self.levels)

    @property
    def n(self) -> int:
        return self.levels[0].n

    @property
    def n_pad(self) -> int:
        return self.levels[0].n_pad

    @property
    def dtype(self):
        return self.levels[0].dtype


@dataclasses.dataclass(frozen=True)
class SolveParams:
    """Hashable static solve configuration (closed over by jit)."""

    smoother: str = "chebyshev"
    preSmooth: int = 3
    postSmooth: int = 3
    jacobi_omega: float = 2.0 / 3.0
    direct_solver: str = "LU"
    CG_coarsest_max_iter: int = 150
    CG_coarsest_tol: float = 1e-12
    # recompute r = A u - rhs every k CG iterations (0 = never): keeps the
    # recursive residual honest in low precision (f32 drift reaches ~1e-6
    # relative without it; van der Vorst residual replacement). Default 0
    # matches the reference's recursive-residual pCG exactly (iteration-
    # count parity); true_res on the result reports the honest number.
    residual_replace: int = 0

    @classmethod
    def from_options(cls, o: Options) -> "SolveParams":
        return cls(
            smoother=o.smoother,
            preSmooth=o.preSmooth,
            postSmooth=o.postSmooth,
            jacobi_omega=o.jacobi_omega,
            direct_solver=o.direct_solver,
            CG_coarsest_max_iter=o.CG_coarsest_max_iter,
            CG_coarsest_tol=o.CG_coarsest_tol,
        )


@dataclasses.dataclass
class SetupInfo:
    """Per-level summary for print_lev_info-style reporting
    (ref saena_object.cpp:111-145) plus the host-side CSR hierarchy, kept to
    support the lazy-update API (ref saena_object_lazy.cpp update1/2/3:
    values-only refresh reusing the existing P/R)."""

    sizes: list
    nnzs: list
    densities: list
    formats: list
    dtypes: list
    thetas: list
    coarsen_kinds: list  # "h" or "p"
    csr_levels: list = dataclasses.field(default_factory=list, repr=False)
    Ps: list = dataclasses.field(default_factory=list, repr=False)
    Rs: list = dataclasses.field(default_factory=list, repr=False)
    comm: object = None   # CommMeter when built by parallel/dist_setup.py
    n_shards: int = 0     # shard count of the setup that built this (dist)
    phases: dict = dataclasses.field(default_factory=dict, repr=False)
    # per-phase setup seconds (PhaseTimer): phases OVERLAP across setup's
    # worker threads, so the sum may exceed the wall entry — each value is
    # the total thread-time that phase occupied (the "where does setup go"
    # budget, VERDICT r4 #1)

    def shard_stats(self, n_shards: int = 0, splits=None) -> list:
        """Per-level per-shard (M_min, M_avg, M_max, nnz_min, nnz_avg,
        nnz_max) under the nnz-balanced 1-D row split — the fields the
        reference's print_lev_info reports across ranks
        (saena_object.cpp:111-145). ``splits``: optional explicit per-level
        splits (e.g. a sharded hierarchy's actual device splits); otherwise
        the canonical nnz-balanced split at ``n_shards`` (default: the
        shard count the setup ran with, or 1)."""
        from saena_tpu.parallel.partition import nnz_balanced_split

        d = n_shards or self.n_shards or 1
        out = []
        for l, A in enumerate(self.csr_levels):
            split = (np.asarray(splits[l]) if splits is not None
                     else nnz_balanced_split(A.tocsr(), d))
            M = np.diff(split)
            csum = np.concatenate([[0], np.cumsum(np.diff(A.tocsr().indptr))])
            nnz = csum[split[1:]] - csum[split[:-1]]
            out.append((int(M.min()), int(M.mean()), int(M.max()),
                        int(nnz.min()), int(nnz.mean()), int(nnz.max())))
        return out

    def table(self, shards: int = 0) -> str:
        """Level summary; with ``shards`` (or a dist-built info), adds the
        reference's per-rank M/nnz min-avg-max columns (print_lev_info
        parity, saena_object.cpp:111-145)."""
        d = shards or self.n_shards
        lines = ["lvl       rows          nnz    density  format    dtype     coarsen"]
        stats = self.shard_stats(d) if d > 1 else None
        if stats is not None:
            lines[0] += "  M(min,avg,max)            nnz(min,avg,max)"
        for i in range(len(self.sizes)):
            row = (
                f"{i:<3} {self.sizes[i]:>10} {self.nnzs[i]:>12}  "
                f"{self.densities[i]:>9.2e}  {self.formats[i]:<8} "
                f"{self.dtypes[i]:<9} {self.coarsen_kinds[i]}"
            )
            if stats is not None:
                m0, m1, m2, z0, z1, z2 = stats[i]
                row += (f"  ({m0},{m1},{m2})" .ljust(26)
                        + f"({z0},{z1},{z2})")
            lines.append(row)
        return "\n".join(lines)


# ---------------------------------------------------------------------------


class PhaseTimer:
    """Accumulates per-phase wall seconds across setup's worker threads.
    One setup runs at a time per process (its executor owns the workers);
    the ACTIVE timer is a module global so the nested level tasks and the
    dist-setup shard tasks need no signature changes. Phases overlap by
    design (eig Lanczos runs behind Galerkin; level builds pipeline), so
    sum(seconds) can exceed the setup wall time."""

    def __init__(self):
        self.seconds: dict = {}
        self._lock = threading.Lock()

    def add(self, name: str, s: float) -> None:
        with self._lock:
            self.seconds[name] = self.seconds.get(name, 0.0) + s

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(name, time.perf_counter() - t0)


class _NullTimer:
    @contextmanager
    def phase(self, name: str):
        yield

    def add(self, name: str, s: float) -> None:
        pass


_NULL_TIMER = _NullTimer()
_ACTIVE_TIMER = _NULL_TIMER


def _timer():
    return _ACTIVE_TIMER


def default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _transfer_from_csr(M: sp.csr_matrix, dtype):
    """Device format for P/R transfer operators: fastest gather format by
    estimated matvec time (strip / strip8 / BSR — the per-element gather
    of ELL is the bottleneck on TPU), ELL elsewhere."""
    from saena_tpu.ops.formats import pick_gather_format

    if jax.default_backend() != "cpu" and M.nnz > 0:
        builder = pick_gather_format(M, dtype)
        if builder is not None:
            return builder(M, dtype=dtype)
    return ell_from_csr(M, dtype=dtype, width_quantile=0.98)


def coarsen_csr(A: sp.csr_matrix, lvl: int, opts: Options):
    """One h-coarsening step: aggregation -> P -> R -> filtered Galerkin Ac.
    Returns (P, R, Ac, last_flag, theta_used, struct) or None if coarsening
    is not possible/useful (ref coarsen(), saena_object.cpp:409-538).
    ``struct`` is (agg, wq) when the level supports structural (fused SA)
    transfer operators on device, else None."""
    n = A.shape[0]
    tm = _timer()
    with tm.phase("aggregation"):
        if opts.aggregation == "double":
            from saena_tpu.amg.strength import find_aggregation_double
            agg, n_c, theta = find_aggregation_double(
                A, opts.connStrength, opts.adaptive_coarsening)
        else:
            agg, n_c, theta = find_aggregation(
                A, opts.connStrength, opts.adaptive_coarsening)
    if n_c == 0 or n_c >= n:
        return None
    last = False
    if opts.dynamic_levels:
        if n_c <= opts.least_row_threshold:
            last = True
        elif n_c / n > opts.row_reduction_up_thrshld:
            last = True
    with tm.phase("prolongation"):
        P = smoothed_prolongator(A, agg, n_c, omega=opts.Pomega,
                                 psmoother=opts.PSmoother)
        R = restriction(P)
    with tm.phase("rap"):
        if opts.rap == "device":
            # block-sparse MXU engine: host symbolic, device numeric
            # (ops/bspgemm.py); f64 on CPU, f32+HIGHEST on TPU
            from saena_tpu.ops.bspgemm import spgemm_blocks
            dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
            Ac = spgemm_blocks(spgemm_blocks(R, A, dtype=dt), P, dtype=dt)
        else:
            Ac = galerkin_product(R, A, P)
    with tm.phase("coarsen_tail"):
        P, R, Ac, agg, struct = coarsen_tail(A, P, R, Ac, agg, lvl, opts)
    return P, R, Ac, last, theta, struct


def coarsen_tail(A: sp.csr_matrix, P, R, Ac, agg, lvl: int, opts: Options):
    """Post-Galerkin finishing shared by the serial and distributed setups:
    filter/lumping, optional sparsification, RCM reordering, and the
    structural-transfer eligibility check. All row-local or coordinator-side
    work (the reference runs filter + shrink decisions after triple_mat_mult
    the same way, saena_object_setup2.cpp:161-341)."""
    thre = filter_threshold(lvl + 1, opts.filter_thre, opts.filter_max,
                            opts.filter_start, opts.filter_rate)
    Ac = filter_lump(Ac, thre)
    if opts.sample_sz_percent < 1.0:
        Ac = sparsify_majid(Ac, opts.sample_sz_percent)
    if opts.reorder_coarse and Ac.shape[0] > 256:
        # symmetric RCM reordering: narrows the coarse operator's band so
        # block formats stay compact — a setup-time re-numbering exactly
        # like the reference's repartition freedom. Grid-ordered operators
        # (stencil aggregates) are often already better than the RCM band,
        # so keep whichever ordering yields the smaller block footprint —
        # decided on the PERMUTED COORDINATE pattern so the losing (common)
        # case never pays the two fancy-index CSR permutes.
        from saena_tpu.ops.formats import (
            bsr_block_width, bsr_bytes_estimate, rcm_permutation)

        perm = rcm_permutation(Ac)
        iperm = np.empty_like(perm)
        iperm[perm] = np.arange(perm.size)
        coo = Ac.tocoo()
        n_br, W_p = bsr_block_width(iperm[coo.row], iperm[coo.col], Ac.shape)
        if n_br * W_p * 1024 * 4 < bsr_bytes_estimate(Ac):
            Ac = Ac[perm][:, perm].tocsr()
            Ac.sort_indices()
            Ac._saena_bsr_geom = ((Ac.shape, Ac.nnz), (n_br, W_p))
            P = P[:, perm].tocsr()
            R = R[perm].tocsr()
            agg = iperm[agg]
    # structural (fused) device transfers need R = P^T to decompose through
    # a SYMMETRIC A (ops/transfers.py); sparsified hierarchies break it
    struct = None
    sym = None
    if opts.structural_transfers and opts.sample_sz_percent >= 1.0:
        from saena_tpu.ops.transfers import is_symmetric
        from saena_tpu.amg.prolongation import smoothing_diag
        sym = is_symmetric(A)
        if sym:
            struct = (agg, smoothing_diag(A, opts.Pomega, opts.PSmoother))
    if sym and opts.sample_sz_percent >= 1.0:
        # Galerkin with R = P^T preserves symmetry to roundoff (well under
        # is_symmetric's 1e-12 rtol); pre-seeding the flag saves the
        # transpose-compare on every coarse level
        try:
            Ac._saena_symmetric = ((Ac.shape, Ac.nnz), True)
        except AttributeError:
            pass
    return P, R, Ac, agg, struct


def setup(
    A: sp.csr_matrix,
    opts: Optional[Options] = None,
    dtype=None,
    use_dense: bool = False,
    p_levels: Optional[list] = None,
    coarsen_fn=None,
) -> tuple[Hierarchy, SetupInfo]:
    """Build the AMG hierarchy from a host CSR matrix.

    ``p_levels``: optional list of host prolongation CSRs to apply FIRST
    (p-coarsening path for high-order FEM, ref saena_object_pcoarsen_modal
    .cpp) before switching to h-coarsening; built by saena_tpu.amg.pcoarsen.

    ``coarsen_fn``: optional replacement for :func:`coarsen_csr` with the
    same (A, lvl, opts) -> (P, R, Ac, last, theta, struct)|None contract —
    the shard-parallel setup (parallel/dist_setup.py) plugs in here.
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    global _ACTIVE_TIMER
    opts = opts or Options()
    dtype = dtype or default_dtype()
    low_dtype = jnp.dtype(opts.low_dtype)
    # install the per-phase budget collector (module global: one setup at a
    # time per process; nested/threaded level tasks find it without
    # signature plumbing). A nested setup (shouldn't happen) would simply
    # co-mingle its phases.
    timer = PhaseTimer()
    prev_timer, _ACTIVE_TIMER = _ACTIVE_TIMER, timer
    t_wall0 = time.perf_counter()

    A = A.tocsr().astype(np.float64)
    A.sort_indices()

    if opts.debug:
        if not np.isfinite(A.data).all():
            raise FloatingPointError("matrix values contain NaN/Inf")
        if A.shape[0] != A.shape[1]:
            raise ValueError(f"AMG needs a square matrix, got {A.shape}")

    diag0 = A.diagonal()
    if np.any(diag0 == 0):
        n_zero = int(np.sum(diag0 == 0))
        raise ValueError(
            f"matrix has {n_zero} zero diagonal entr{'y' if n_zero == 1 else 'ies'}: "
            "AMG smoothing needs D^-1 (the reference divides by the diagonal "
            "too, saena_matrix_setup.cpp inverse_diag). Graph Laplacians like "
            "G55 are SpGEMM fixtures, not solve targets; shift or scale first.")

    inv_sq_diag = None
    if opts.scale:
        d = A.diagonal()
        isd = 1.0 / np.sqrt(np.abs(np.where(d == 0, 1.0, d)))
        D = sp.diags(isd)
        A = (D @ A @ D).tocsr()
        inv_sq_diag = isd

    # ---- host coarsening loop, with eig estimation OVERLAPPED ----
    # Each level's lambda_max(D^-1 A) is independent host work; as soon as
    # a level is known to be non-coarsest (its coarse level exists) its
    # Lanczos run is submitted to a background thread, hiding the eig cost
    # behind the Galerkin products of deeper levels and behind devicify's
    # device transfers. Values are bitwise-identical to the serial order.
    exe = ThreadPoolExecutor(max_workers=_setup_workers())
    eig_futs: dict = {}
    build_futs: dict = {}

    csr_levels = [A]
    Ps, Rs = [], []
    thetas, kinds, structs = [], [], []

    submitted: set = set()

    def _submit_prior(csr_levels):
        # level l = len-2 just became non-coarsest: its eig Lanczos can run
        # now, behind the coarsening of deeper levels. Only eig is eager —
        # submitting the full device build here too was measured SLOWER
        # in r3 (14.8 vs 11.8 s) AND AGAIN in r5 after the planner sweeps
        # were sample-ranked and the SpGEMM made branch-free (interleaved
        # A/B on the 48^3 TPU setup: eager 10.6-14.9 s vs lazy 9.5-10.9,
        # with the rap phase inflating 5.0 -> 7.3 s — the build's packing
        # memory traffic steals the 2 cores RAP needs; eig is one mostly-
        # BLAS1 thread that fills scheduling gaps). SAENA_EAGER_BUILD
        # opts in for experimentation on wider hosts, where spare cores
        # could hide the build behind RAP (FIFO submission keeps the
        # build's eig wait deadlock-free: eig_l always precedes build_l).
        l = len(csr_levels) - 2
        if l < 0 or l in submitted:
            return
        submitted.add(l)
        if (opts.smoother == "chebyshev"
                and not (l == 0 and opts.eig > 0)):
            def _timed_eig(Acur=csr_levels[l]):
                with _timer().phase("eig"):
                    return eig_max_invdiag_host(Acur)
            eig_futs[l] = exe.submit(_timed_eig)
        if os.environ.get("SAENA_EAGER_BUILD"):
            build_futs[l] = exe.submit(
                _level_task, l, False, csr_levels, Ps, Rs, structs, opts,
                dtype, use_dense, eig_futs)

    try:
        if p_levels:
            for P in p_levels:
                Acur = csr_levels[-1]
                R = restriction(P)
                Ac = galerkin_product(R, Acur, P)
                Ps.append(P)
                Rs.append(R)
                csr_levels.append(Ac)
                thetas.append(None)
                kinds.append("p")
                structs.append(None)
                _submit_prior(csr_levels)

        while len(csr_levels) - 1 < opts.max_level:
            Acur = csr_levels[-1]
            lvl = len(csr_levels) - 1
            if opts.dynamic_levels and \
                    Acur.shape[0] <= opts.least_row_threshold:
                break
            out = (coarsen_fn or coarsen_csr)(Acur, lvl, opts)
            if out is None:
                break
            P, R, Ac, last, theta, struct = out
            Ps.append(P)
            Rs.append(R)
            csr_levels.append(Ac)
            thetas.append(theta)
            kinds.append("h")
            structs.append(struct)
            _submit_prior(csr_levels)
            if last:
                break

        hierarchy, info = devicify(
            csr_levels, Ps, Rs, opts, dtype=dtype, use_dense=use_dense,
            inv_sq_diag=inv_sq_diag, structs=structs,
            eig_futures=eig_futs, executor=exe, build_futures=build_futs,
        )
    finally:
        exe.shutdown(wait=False)
        _ACTIVE_TIMER = prev_timer
    timer.add("wall", time.perf_counter() - t_wall0)
    info.phases = timer.seconds
    info.thetas = thetas + [None]
    info.coarsen_kinds = kinds + ["-"]
    return hierarchy, info


def _setup_workers() -> int:
    # exactly the core count: the per-level build tasks are CPU-bound
    # planners with embedded GIL-releasing upload RPCs; oversubscribing
    # thrashes (measured 14.7 s at 6 workers vs 11.3 s at 2 on 2 cores)
    import os

    return max(2, min(4, os.cpu_count() or 2))


class _DoneFuture:
    """Minimal completed-future shim for devicify's eig_futures dict."""

    def __init__(self, v):
        self._v = v

    def result(self):
        return self._v


def _same_pattern(a: sp.csr_matrix, b: sp.csr_matrix) -> bool:
    """True when two CSRs share shape + sparsity pattern (values may
    differ) — the precondition for every lazy-update reuse."""
    if a is b:
        return True
    if a.shape != b.shape or a.nnz != b.nnz:
        return False
    return np.array_equal(a.indptr, b.indptr) and \
        np.array_equal(a.indices, b.indices)


# NOTE: _saena_symmetric is deliberately NOT transferred — symmetry is a
# property of the VALUES, not the pattern, so a same-pattern value refresh
# may flip it (ADVICE r4: a stale True would let a later setup enable the
# structural R=P^T path on a non-symmetric A).
_PLAN_MEMO_ATTRS = ("_saena_strip_pick", "_saena_bsr_geom")


def _transfer_plan_memos(old: sp.csr_matrix, new: sp.csr_matrix) -> None:
    """Copy pattern-only planning memos from ``old`` onto ``new`` (same
    pattern, new values): strip pick, BSR geometry, and the
    strip8 plan (its layout is pattern-only; the stored COO is re-derived
    from the NEW matrix so value scatters see fresh data)."""
    if not _same_pattern(old, new):
        return
    for attr in _PLAN_MEMO_ATTRS:
        tok = getattr(old, attr, None)
        if tok is not None:
            try:
                setattr(new, attr, tok)
            except AttributeError:
                return
    tok = getattr(old, "_saena_strip8_plan", None)
    if tok is not None and tok[1] is not None:
        try:
            new.sort_indices()
            new._saena_strip8_plan = (tok[0], (new.tocoo(), tok[1][1]))
        except AttributeError:
            pass


def devicify(
    csr_levels,
    Ps,
    Rs,
    opts: Options,
    dtype=None,
    use_dense: bool = False,
    inv_sq_diag=None,
    structs=None,
    eig_futures=None,
    executor=None,
    build_futures=None,
    reuse=None,
) -> tuple[Hierarchy, SetupInfo]:
    """Convert a host CSR hierarchy into device Level pytrees. Split out of
    setup() so the lazy-update path (update1/2/3) can re-devicify after a
    values-only refresh without re-aggregating (lazy updates pass no
    ``structs``: a refreshed A breaks the fused-transfer identity, so they
    get direct P/R strips).

    ``eig_futures``: per-level futures of eig_max_invdiag_host submitted by
    setup() during coarsening (the overlapped path); missing levels compute
    inline. ``executor``: thread pool for per-level format building — each
    level's planning + device transfers are independent, and the transfer
    RPCs release the GIL, so levels pipeline. ``build_futures``: results of
    _level_task already submitted by setup() DURING coarsening (fine levels
    are final the moment their coarse level exists). All paths assemble in
    level order and are bitwise-identical to the serial build.

    ``reuse``: (old_hierarchy, old_csrs, old_Ps, old_Rs) from the previous
    devicify — the LAZY-UPDATE fast path (ref ITER_LAZY design,
    saena_object.h:19): levels whose CSR object is unchanged are reused
    wholesale (update1 touches only level 0); levels whose PATTERN is
    unchanged reuse the old level's eig estimate and format plans
    (transferred onto the new CSR) and its P/R device objects, so a
    values-only update re-plans and re-Lanczos's nothing."""
    dtype = dtype or default_dtype()
    n_lv = len(csr_levels)

    # ---- device conversion ----
    info = SetupInfo([], [], [], [], [], [None] * n_lv, ["-"] * n_lv,
                     csr_levels=list(csr_levels), Ps=list(Ps), Rs=list(Rs))

    reuse_eigs = None
    if reuse is not None:
        old_hier, old_csrs, old_Ps, old_Rs = reuse
        reuse_eigs = {}
        for l in range(min(n_lv, len(old_csrs))):
            if _same_pattern(old_csrs[l], csr_levels[l]):
                _transfer_plan_memos(old_csrs[l], csr_levels[l])
                if old_hier.levels[l].eig_max is not None:
                    # values-only refresh: reuse lambda_max — the lazy
                    # path's approximation (a small value change moves the
                    # Chebyshev endpoint marginally; full set_matrix
                    # recomputes it)
                    reuse_eigs[l] = old_hier.levels[l].eig_max

    def _build_level(l):
        if build_futures is not None and l in build_futures:
            return build_futures[l].result()
        is_coarsest = l == n_lv - 1
        if reuse is not None and l < len(old_csrs):
            old_lv = old_hier.levels[l]
            same_A = old_csrs[l] is csr_levels[l]
            same_PR = is_coarsest or (
                l < len(old_Ps) and old_Ps[l] is Ps[l]
                and old_Rs[l] is Rs[l])
            same_pat = l in (reuse_eigs or {}) or \
                _same_pattern(old_csrs[l], csr_levels[l])
            if same_A and same_PR and (not is_coarsest or True):
                Acsr = csr_levels[l]
                nloc = Acsr.shape[0]
                return old_lv, (nloc, int(Acsr.nnz),
                                Acsr.nnz / max(1, nloc * nloc),
                                type(old_lv.A).__name__, str(old_lv.A.dtype))
            if same_PR and same_pat:
                # values-only: rebuild A + inv_diag, graft the old P/R
                # UNCHANGED. Structural SmoothedP/R embed the A they were
                # smoothed with — the smoothing identity P=(I-wq*A)P_t only
                # matches the host Ps/Rs (which the coarse operators were
                # built through) for THAT A, so the old embedded operator
                # must be kept, not re-pointed at the refreshed A
                # (ADVICE r4: re-pointing diverged device P from host P and
                # could break R = P^T / pCG's SPD requirement).
                lv, row = _level_task(
                    l, is_coarsest, csr_levels, Ps, Rs, None, opts, dtype,
                    use_dense,
                    {l: _DoneFuture(reuse_eigs[l])} if l in reuse_eigs
                    else None, skip_transfers=True)
                lv = dataclasses.replace(lv, P=old_lv.P, R=old_lv.R)
                return lv, row
        return _level_task(l, is_coarsest, csr_levels, Ps, Rs, structs,
                           opts, dtype, use_dense, eig_futures)

    if executor is not None and n_lv > 1:
        built = list(executor.map(_build_level, range(n_lv)))
    else:
        built = [_build_level(l) for l in range(n_lv)]
    levels = []
    for level, (n, nnz, dens, fmt, dts) in built:
        levels.append(level)
        info.sizes.append(n)
        info.nnzs.append(nnz)
        info.densities.append(dens)
        info.formats.append(fmt)
        info.dtypes.append(dts)

    # ---- coarsest factorization (cached across solves) ----
    _t0_lu = time.perf_counter()
    coarse_lu = None
    if (reuse is not None and opts.direct_solver == "LU"
            and len(old_csrs) == n_lv and old_csrs[-1] is csr_levels[-1]
            and old_hier.coarse_lu is not None):
        coarse_lu = old_hier.coarse_lu      # update1: coarsest untouched
    elif opts.direct_solver == "LU":
        Acoarse = csr_levels[-1]
        n = Acoarse.shape[0]
        # the coarse DIRECT solve runs at the VECTOR dtype regardless of
        # float_level: the reference's SuperLU always factors in f64, and
        # an f32 inverse apply on an ill-conditioned coarsest operator
        # wrecks the preconditioner (SiH4: 149 vs 65 iterations from a
        # single f32 4x4 coarse solve). No TPU cost — vectors are f32 there.
        dt = dtype
        # LU needs at least f32 (no bf16/f16 factorization kernels)
        if jnp.dtype(dt).itemsize < 4:
            dt = jnp.float32
        n_pad = pad_to(n)
        coarse_dense = None
        if n_pad <= 2048:
            # host f64 inverse, zero-padded; applied as MXU matmuls. A
            # singular/semidefinite coarsest operator (pure-Neumann) has no
            # inverse — fall back to the unit-diag-padded LU (ADVICE r1).
            coarse_dense = Acoarse.toarray()
            try:
                inv_nn = np.linalg.inv(coarse_dense)
                if not np.isfinite(inv_nn).all():
                    raise np.linalg.LinAlgError("non-finite inverse")
            except np.linalg.LinAlgError:
                coarse_dense = None
        if coarse_dense is not None:
            inv = np.zeros((n_pad, n_pad))
            inv[:n, :n] = inv_nn
            ad = np.zeros((n_pad, n_pad))
            ad[:n, :n] = coarse_dense
            coarse_lu = CoarseLU(
                lu=None, piv=None, inv=to_device(inv, dt),
                adense=to_device(ad, dt), n=n)
        else:
            dm = dense_from_csr(Acoarse, dtype=dt, unit_diag_pad=True)
            lu, piv = jax.scipy.linalg.lu_factor(dm.data)
            coarse_lu = CoarseLU(lu=lu, piv=piv, inv=None, adense=None, n=n)
    _timer().add("coarse_lu", time.perf_counter() - _t0_lu)

    hierarchy = Hierarchy(
        levels=tuple(levels),
        coarse_lu=coarse_lu,
        inv_sq_diag=None if inv_sq_diag is None
        else jnp.asarray(
            np.pad(inv_sq_diag,
                   (0, pad_to(csr_levels[0].shape[0]) - csr_levels[0].shape[0])),
            dtype=dtype),
    )
    return hierarchy, info


def _level_task(l, is_coarsest, csr_levels, Ps, Rs, structs, opts,
                dtype, use_dense, eig_futures, skip_transfers=False):
    """Build ONE level's device objects (A format, inv_diag, eig, P/R).
    Runs on setup's worker threads — possibly WHILE deeper levels are still
    coarsening: level l is final the moment level l+1 exists, and the lists
    are append-only, so reading [l] and [l+1] is safe. Bitwise-identical to
    the serial build."""
    low_dtype = jnp.dtype(opts.low_dtype)
    Acsr = csr_levels[l]
    # storage reduction only under the OPT-IN float_storage flag: the
    # reference's float_level keeps local values double (wire-only float,
    # matvec_sparse_float) — whole-operator casts wreck ill-scaled coarse
    # operators (SiH4: 53 -> 156 iterations)
    dt = low_dtype if (opts.float_storage and l >= opts.float_level) \
        else dtype
    # reduced-precision smoother twin built at conversion time from the
    # same host arrays — a device-side astype would pay one remote XLA
    # compile per level (bf16 DIA twins stream half the diagonal bytes
    # through the same Pallas kernel; unsupported dtypes keep f32)
    sm_dt = None
    if opts.smooth_dtype and not is_coarsest:
        sm_dt = jnp.dtype(opts.smooth_dtype)
        if sm_dt == jnp.dtype(dt):
            sm_dt = None
    A_smooth = None
    tm = _timer()
    with tm.phase("devicify_A"):
        if is_coarsest and opts.direct_solver == "LU":
            Adev = dense_from_csr(Acsr, dtype=dt, unit_diag_pad=True)
        elif sm_dt is not None:
            Adev, A_smooth = device_matrix_from_csr(
                Acsr,
                dtype=dt,
                dense_thre=opts.dense_thre,
                dense_sz_thre=opts.dense_sz_thre,
                switch_to_dense=opts.switch_to_dense and (l > 0 or use_dense),
                smooth_dtype=sm_dt,
            )
        else:
            Adev = device_matrix_from_csr(
                Acsr,
                dtype=dt,
                dense_thre=opts.dense_thre,
                dense_sz_thre=opts.dense_sz_thre,
                switch_to_dense=opts.switch_to_dense and (l > 0 or use_dense),
            )
    n = Acsr.shape[0]
    n_pad = pad_to(n)
    diag = Acsr.diagonal()
    inv_diag = np.zeros(n_pad)
    inv_diag[:n] = np.where(diag != 0, 1.0 / np.where(diag == 0, 1.0, diag), 0.0)

    eig = None
    if opts.smoother == "chebyshev" and not is_coarsest:
        if l == 0 and opts.eig > 0:
            eig = float(opts.eig)    # user-provided (ref set_eig)
        elif eig_futures is not None and l in eig_futures:
            with tm.phase("eig_wait"):
                eig = float(eig_futures[l].result())
        else:
            with tm.phase("eig"):
                eig = float(eig_max_invdiag_host(Acsr))

    P_dev = R_dev = None
    if not is_coarsest and not skip_transfers:
        _t0_pr = time.perf_counter()
        dt_next = low_dtype if (opts.float_storage
                                and (l + 1) >= opts.float_level) else dtype
        struct = structs[l] if structs else None
        # "force" builds structural transfers whenever eligible, skipping
        # the backend gate and the time estimates — the CPU-CI hook for the
        # TPU-only branch (ADVICE r4: it was otherwise untested on CPU)
        force_struct = opts.structural_transfers == "force"
        if struct is not None and (force_struct
                                   or jax.default_backend() != "cpu"):
            from saena_tpu.ops.formats import (
                gather_time_estimate, gather_time_estimate_quick)
            from saena_tpu.ops.transfers import (
                build_structural, structural_estimate)
            agg, wq = struct
            n_c = csr_levels[l + 1].shape[0]
            if force_struct:
                P_dev, R_dev = build_structural(
                    agg, n_c, wq, Adev, int(Ps[l].nnz), dt, dt_next)
            else:
                est_s = structural_estimate(agg, n_c, Adev, dt)
                # cheap gate first: when the structural path beats even a
                # 3x optimistic direct estimate, skip the exact probe —
                # the strip8 planner walks every nonzero of P AND R only
                # to have its answer discarded (~1 s/level of 48^3 setup)
                est_dq = (gather_time_estimate_quick(Ps[l], dt_next)
                          + gather_time_estimate_quick(Rs[l], dt_next))
                if np.isfinite(est_s) and est_s < est_dq / 3.0:
                    P_dev, R_dev = build_structural(
                        agg, n_c, wq, Adev, int(Ps[l].nnz), dt, dt_next)
                else:
                    est_d = (gather_time_estimate(Ps[l], dt_next)
                             + gather_time_estimate(Rs[l], dt_next))
                    if est_s < est_d and np.isfinite(est_s):
                        P_dev, R_dev = build_structural(
                            agg, n_c, wq, Adev, int(Ps[l].nnz), dt, dt_next)
        if P_dev is None:
            P_dev = _transfer_from_csr(Ps[l], dt_next)
            R_dev = _transfer_from_csr(Rs[l], dt_next)
        tm.add("devicify_PR", time.perf_counter() - _t0_pr)

    # inv_diag carries the VECTOR dtype: smoother/residual arithmetic
    # stays full-precision while A/P/R matvecs run reduced (ref
    # float_level semantics — only vSend_f/matvec buffers are float)
    level = Level(A=Adev, inv_diag=to_device(inv_diag, dtype),
                  P=P_dev, R=R_dev, A_smooth=A_smooth, n=n, lvl=l,
                  eig_max=eig)
    return level, (n, int(Acsr.nnz), Acsr.nnz / max(1, n * n),
                   type(Adev).__name__, str(jnp.dtype(dt)))
