"""Windowed-kernel halo multigrid: band-segment exchange + Pallas SpMV.

parallel/halo.py exchanges publish-slot lists and runs the XLA ELL
gather per shard — correct everywhere, but the gather path is the
serial ~6.8 ns/element one (DESIGN.md "The windowed-ELL Pallas
kernel").  This module is the kernel-speed variant: rows keep the
GLOBAL induced-RCM ordering (solver/ordering.py — the same ordering the
single-chip windowed path uses, so every operator family stays banded),
each level is partitioned into equal B_ROWS-aligned contiguous blocks,
and the halo is exchanged as CONTIGUOUS BAND SEGMENTS:

    up   = ppermute(x_local[R-hlo:], i -> i+1)     # prev block's tail
    down = ppermute(x_local[:hhi],  i -> i-1)      # next block's head
    xx   = concat(up, x_local, down)               # a contiguous GLOBAL
                                                   # slice [dR-hlo, (d+1)R+hhi)

so a device's column space is a shifted window of the global band and
the windowed-ELL layouts (ops/well.py) apply verbatim: the stacked
local operators are ONE build over sp.vstack of the per-device blocks
(kernel blocks = 1024 rows never straddle devices since R % 1024 == 0),
whose static layout metadata (w, per-tap spans, H, XR) is automatically
the max over devices — the SPMD-uniform program shard_map needs — while
the per-block window starts rb/ob stay per-device DATA.  Smoothing,
residual, restrict and prolong then run as the same fused-epilogue
kernel calls as the single-chip padded flow (solver/vcycle._vcycle_tiled).

Publish-slot addressing is structurally wrong for the kernel: canonical
CSR slots mix interior rows' local columns with boundary rows' halo
columns in the SAME tap, so per-tap window spans blow up to the whole
publish buffer.  Segment exchange keeps halo references band-adjacent.

Levels whose halo would span more than one neighbor block (band > R)
replicate instead: xx = all_gather(x_local) and the block columns stay
global — O(n_level) comms only where n_level is small.  The expensive
case this would naively create is RESTRICTION into a coarse level too
small to spread over all devices (n_{l+1} < D*B_ROWS): its PT rows sit
on device 0 but reference the whole fine vector, which would force an
O(n_fine) all_gather of the FINE level.  Instead such restrictions are
COLUMN-partitioned: device d's shard holds PT[:, fine-block d] (all
coarse rows, only its own fine columns — exact, since fine rows have
unique owners), each shard computes a full-length partial coarse
product from its LOCAL fine vector with no exchange at all, and the
partials are psum-reduced over the small padded coarse space — O(n_c*D)
comms instead of O(n_fine).  The coarsest level is gathered and solved
with the replicated dense pseudo-inverse, as in the other paths.

The reference is single-process CPU code (SURVEY.md §2.8); this is new
design — the domain analog of tensor parallelism with ring halos.
Jacobi/Chebyshev smoothing is order-free, so residual histories match
parallel/halo.py and parallel/spmd.py exactly (up to dtype rounding),
which the tests assert.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.ops.well import (
    B_ROWS,
    build_well_auto,
    well_apply,
)
from surface_multigrid_code_tpu.solver.ordering import (
    finest_rcm,
    induced_orderings,
    permute_hierarchy,
)
from surface_multigrid_code_tpu.solver.vcycle import _power_iteration_lam_max


def _pad_to(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


def _col_extents(M: sp.csr_matrix, Rr: int, Rc: int, D: int):
    """(hlo, hhi): how far below/above its own V-block [d*Rc, (d+1)*Rc)
    any device's rows of M reach, maxed over devices."""
    M = M.tocsr()
    hlo = hhi = 0
    for d in range(D):
        lo = min(d * Rr, M.shape[0])
        hi = min((d + 1) * Rr, M.shape[0])
        cols = M.indices[M.indptr[lo]:M.indptr[hi]]
        if cols.size == 0:
            continue
        hlo = max(hlo, d * Rc - int(cols.min()))
        hhi = max(hhi, int(cols.max()) - ((d + 1) * Rc - 1))
    return max(0, hlo), max(0, hhi)


def _stack_blocks(M: sp.spmatrix, Rr: int, Rc: int, D: int,
                  hlo: int, hhi: int, replicate: bool) -> sp.csr_matrix:
    """vstack of per-device row blocks of M with device-local column
    shifts (col - d*Rc + hlo), or global columns when replicate."""
    M = M.tocsr()
    Mp = sp.csr_matrix(M, copy=True)
    Mp.resize((Rr * D, M.shape[1]))
    ncols_local = D * Rc if replicate else Rc + hlo + hhi
    blocks = []
    for d in range(D):
        blk = Mp[d * Rr:(d + 1) * Rr].tocoo()
        shift = 0 if replicate else (hlo - d * Rc)
        cols = blk.col + shift
        assert cols.size == 0 or (
            cols.min() >= 0 and cols.max() < ncols_local
        ), "halo extents do not cover this block's stencil"
        blocks.append(sp.coo_matrix(
            (blk.data, (blk.row, cols)), shape=(Rr, ncols_local)
        ))
    return sp.vstack(blocks).tocsr()


def _stack_colblocks(M: sp.spmatrix, nrows_pad: int, Rc: int,
                     D: int) -> sp.csr_matrix:
    """vstack of per-device COLUMN blocks of M (rows padded to nrows_pad,
    columns restricted to device d's block [d*Rc, (d+1)*Rc) in local
    coordinates) — the column-partitioned restriction layout."""
    M = sp.csr_matrix(M, copy=True)
    M.resize((nrows_pad, Rc * D))
    blocks = [M[:, d * Rc:(d + 1) * Rc] for d in range(D)]
    return sp.vstack(blocks).tocsr()


def _exchange_seg(x_l, lo: int, hi: int, rep: bool, D: int):
    """Band-segment halo exchange of a row-sharded vector (ppermute of
    the contiguous head/tail segments), or full replication when the
    consumer's window exceeds one neighbor block."""
    if rep:
        g = jax.lax.all_gather(x_l, "rows")
        return g.reshape((-1,) + x_l.shape[1:])
    parts = []
    if lo:
        parts.append(jax.lax.ppermute(
            x_l[-lo:], "rows", [(i, i + 1) for i in range(D - 1)]
        ))
    parts.append(x_l)
    if hi:
        parts.append(jax.lax.ppermute(
            x_l[:hi], "rows", [(i, i - 1) for i in range(1, D)]
        ))
    return jnp.concatenate(parts) if len(parts) > 1 else x_l


def _localize(Ws, R: int):
    """Static-metadata view of stacked well groups for one device's shard
    (n_rows becomes the local row count; leaf arrays stay stacked and are
    sliced by shard_map's row sharding)."""
    return tuple(dataclasses.replace(W, n_rows=R) for W in Ws)


class WellHaloHierarchy:
    """Band-segment halo multigrid on the windowed Pallas kernel."""

    def __init__(
        self,
        As: list[sp.spmatrix],
        Ps: list[sp.spmatrix],
        mesh: Mesh,
        cfg: SolveConfig | None = None,
        dtype=jnp.float32,
    ):
        self.mesh = mesh
        self.cfg = cfg or SolveConfig(smoother=SmootherType.JACOBI)
        if self.cfg.smoother == SmootherType.MULTICOLOR_GS:
            raise NotImplementedError(
                "multicolor GS does not shard order-free; use JACOBI or "
                "CHEBYSHEV (parallel/halo.py mirrors this restriction)"
            )
        self.dtype = dtype
        D = mesh.shape["rows"]
        self.D = D
        L = len(As)
        self.n0 = As[0].shape[0]

        # global induced-RCM ordering — same as the single-chip well path
        self._A0_orig = As[0].tocsr().copy()
        perms = induced_orderings(finest_rcm(As[0].tocsr()), Ps)
        As, Ps = permute_hierarchy(As, Ps, perms)
        self.perm0 = perms[0]
        self._As_perm = As
        self._Ps_perm = Ps
        self._refresh_state = None

        Rs = [_pad_to(A.shape[0], D * B_ROWS) // D for A in As]
        self.Rs = Rs

        # per-level halo extents over the consumers of that level's vector
        # (smoothing/residual A_lv and prolongation P_{lv-1}); the
        # restriction PT_lv joins the segment exchange only when it fits —
        # otherwise it goes column-partitioned (ptcols[lv]) so a small
        # coarse level never forces replicating the fine vector
        self.hlos, self.hhis, self.reps, self.ptcols = [], [], [], []
        for lv in range(L):
            Rl = Rs[lv]
            lo, hi = _col_extents(As[lv], Rl, Rl, D)
            if lv > 0:
                l2, h2 = _col_extents(Ps[lv - 1], Rs[lv - 1], Rl, D)
                lo, hi = max(lo, l2), max(hi, h2)
            lo_pt = hi_pt = 0
            if lv < L - 1:
                lo_pt, hi_pt = _col_extents(
                    Ps[lv].T.tocsr(), Rs[lv + 1], Rl, D)
            mlo = _pad_to(max(lo, lo_pt), B_ROWS)
            mhi = _pad_to(max(hi, hi_pt), B_ROWS)
            lo = _pad_to(lo, B_ROWS)
            hi = _pad_to(hi, B_ROWS)
            if mlo <= Rl and mhi <= Rl:
                lo, hi, rep, ptcol = mlo, mhi, False, False
            elif lo <= Rl and hi <= Rl:
                rep, ptcol = False, True
            else:
                rep, ptcol = True, False
            self.hlos.append(lo)
            self.hhis.append(hi)
            self.reps.append(bool(rep))
            self.ptcols.append(bool(ptcol) and lv < L - 1)

        shard = NamedSharding(mesh, P("rows", None))
        vec = NamedSharding(mesh, P("rows"))
        rep_sh = NamedSharding(mesh, P())

        def put_well(Ws, R):
            out = []
            for W in _localize(Ws, R):
                out.append(dataclasses.replace(
                    W,
                    rb=jax.device_put(W.rb, vec),
                    hb=jax.device_put(W.hb, vec),
                    hi=jax.device_put(W.hi, shard),
                    lo=jax.device_put(W.lo, shard),
                    dat=jax.device_put(W.dat, shard),
                    ob=None if W.ob is None else jax.device_put(W.ob, vec),
                ))
            return tuple(out)

        self.levels = []
        for lv in range(L):
            Rl, lo, hi, rep = Rs[lv], self.hlos[lv], self.hhis[lv], self.reps[lv]
            Astk = _stack_blocks(As[lv], Rl, Rl, D, lo, hi, rep)
            Aw = put_well(build_well_auto(Astk, dtype=dtype), Rl)
            diag = np.ones(Rl * D)
            diag[: As[lv].shape[0]] = As[lv].diagonal()
            lam = (
                _power_iteration_lam_max(As[lv].tocsr())
                if self.cfg.smoother == SmootherType.CHEBYSHEV else 0.0
            )
            self.levels.append(dict(
                Aw=Aw,
                diag=jax.device_put(jnp.asarray(diag, dtype=dtype), vec),
                lam_max=jnp.asarray(lam, dtype=dtype),
                Pw=None, PTw=None,
            ))
        for lv in range(L - 1):
            Rf, Rc = Rs[lv], Rs[lv + 1]
            lo_f, hi_f, rep_f = self.hlos[lv], self.hhis[lv], self.reps[lv]
            lo_c, hi_c, rep_c = self.hlos[lv + 1], self.hhis[lv + 1], self.reps[lv + 1]
            if self.ptcols[lv]:
                # column-partitioned restriction: shard d = PT[:, fine
                # block d], all (padded) coarse rows; applied to the LOCAL
                # fine vector, psum-reduced across shards in the solve
                PTstk = _stack_colblocks(Ps[lv].T.tocsr(), Rc * D, Rf, D)
                self.levels[lv + 1]["PTw"] = put_well(
                    build_well_auto(PTstk, dtype=dtype), Rc * D)
            else:
                PTstk = _stack_blocks(
                    Ps[lv].T.tocsr(), Rc, Rf, D, lo_f, hi_f, rep_f)
                self.levels[lv + 1]["PTw"] = put_well(
                    build_well_auto(PTstk, dtype=dtype), Rc)
            Pstk = _stack_blocks(Ps[lv], Rf, Rc, D, lo_c, hi_c, rep_c)
            self.levels[lv + 1]["Pw"] = put_well(
                build_well_auto(Pstk, dtype=dtype), Rf)

        # replicated coarsest dense pseudo-inverse (matches halo.py)
        nL = Rs[-1] * D
        Ac = sp.csr_matrix(As[-1], copy=True)
        Ac.resize((nL, nL))
        n_last = As[-1].shape[0]
        if nL > n_last:
            pad = np.arange(n_last, nL)
            Ac = (Ac + sp.coo_matrix(
                (np.ones(pad.shape[0]), (pad, pad)), shape=(nL, nL)
            )).tocsr()
        Acd = 0.5 * (Ac.toarray() + Ac.toarray().T)
        wv, U = np.linalg.eigh(Acd)
        cutoff = 1e-10 * float(np.abs(wv).max())
        inv_w = np.where(np.abs(wv) > cutoff,
                         1.0 / np.where(wv == 0, 1, wv), 0.0)
        self.coarse_inv = jax.device_put(
            jnp.asarray((U * inv_w) @ U.T, dtype=dtype), rep_sh)
        self._sm_cache: dict = {}

    # ------------------------------------------------------------------
    def _shard_body(self, lvl_args, coarse_inv, rhs_l, z_l, tol, max_iter):
        cfg = self.cfg
        D = self.D
        L = len(lvl_args)
        hlos, hhis, reps, Rs = self.hlos, self.hhis, self.reps, self.Rs

        def wap(Ws, xx, **kw):
            """well_apply, mapped over trailing RHS columns at trace time
            (the kernel is 1-D; C is static and small — MCF solves C=3).
            2-D `b`/`u` epilogue operands are sliced per column; the
            diag scale `s` is shared."""
            if xx.ndim == 1:
                return well_apply(Ws, xx, unpadded=False, **kw)
            cols = []
            for j in range(xx.shape[1]):
                kwj = {
                    k: (v[:, j] if k in ("b", "u") and v is not None else v)
                    for k, v in kw.items()
                }
                cols.append(well_apply(Ws, xx[:, j], unpadded=False, **kwj))
            return jnp.stack(cols, axis=1)

        def exchange(lv, x_l):
            return _exchange_seg(x_l, hlos[lv], hhis[lv], reps[lv], D)

        def smooth(lv, b_l, u_l, n_iter, sdinv):
            la = lvl_args[lv]
            if cfg.smoother == SmootherType.CHEBYSHEV:
                lam_max = la["lam_max"]
                lam_min = lam_max / 4.0
                theta = 0.5 * (lam_max + lam_min)
                delta = 0.5 * (lam_max - lam_min)
                r = wap(la["Aw"], exchange(lv, u_l),
                        epi="resid_scaled", b=b_l, s=sdinv)
                d = r / theta
                u_l = u_l + d
                sigma = theta / delta
                rho = 1.0 / sigma
                for _ in range(n_iter - 1):
                    rho_new = 1.0 / (2.0 * sigma - rho)
                    r = wap(la["Aw"], exchange(lv, u_l),
                            epi="resid_scaled", b=b_l, s=sdinv)
                    d = rho_new * rho * d + (2.0 * rho_new / delta) * r
                    u_l = u_l + d
                    rho = rho_new
                return u_l
            for _ in range(n_iter):
                u_l = wap(la["Aw"], exchange(lv, u_l), epi="axpby",
                          u=u_l, b=b_l, s=sdinv, escale=cfg.jacobi_weight)
            return u_l

        def vcycle(lv, b_l, u_l):
            la = lvl_args[lv]
            if lv == L - 1:
                g = jax.lax.all_gather(b_l, "rows")
                b_all = g.reshape((-1,) + b_l.shape[1:])
                if coarse_inv.shape[1] == b_all.shape[0]:
                    # static path: the replicated [nLp, nLp] inverse is
                    # row-sharded by the in_specs, so this is the LOCAL
                    # row block times the gathered rhs — u_all is already
                    # this device's coarse rows and the dynamic_slice
                    # below clamps to offset 0
                    u_all = coarse_inv @ b_all
                else:
                    # refreshed coarse inverse is LOGICAL-sized (n_last,
                    # replicated — computed inside the shard); padded
                    # rows solve to zero (their rhs is a zero restriction
                    # product)
                    nLl = coarse_inv.shape[1]
                    u_log = coarse_inv @ b_all[:nLl]
                    u_all = jnp.zeros_like(b_all).at[:nLl].set(u_log)
                me = jax.lax.axis_index("rows")
                return u_l + jax.lax.dynamic_slice_in_dim(
                    u_all, me * Rs[lv], Rs[lv], axis=0)
            sdinv = 1.0 / la["diag"]
            u_l = smooth(lv, b_l, u_l, cfg.pre_relax_iter, sdinv)
            r_l = wap(la["Aw"], exchange(lv, u_l), epi="resid", b=b_l)
            nxt = lvl_args[lv + 1]
            if self.ptcols[lv]:
                part = wap(nxt["PTw"], r_l)
                rc_full = jax.lax.psum(part, "rows")
                me = jax.lax.axis_index("rows")
                rc = jax.lax.dynamic_slice_in_dim(
                    rc_full, me * Rs[lv + 1], Rs[lv + 1], axis=0)
            else:
                rc = wap(nxt["PTw"], exchange(lv, r_l))
            uc = vcycle(lv + 1, rc, jnp.zeros_like(rc))
            u_l = wap(nxt["Pw"], exchange(lv + 1, uc), epi="add", u=u_l)
            return smooth(lv, b_l, u_l, cfg.post_relax_iter, sdinv)

        def resid_norm(z_l):
            r = wap(lvl_args[0]["Aw"], exchange(0, z_l), epi="resid",
                    b=rhs_l)
            return jnp.sqrt(jax.lax.psum((r * r).sum(), "rows"))

        def cond(state):
            k, _, _, done = state
            return jnp.logical_and(~done, k < max_iter)

        def body(state):
            k, z_l, r_his, _ = state
            res = resid_norm(z_l)
            r_his = r_his.at[k].set(res)
            done = res < tol
            z_new = vcycle(0, rhs_l, z_l)
            z_l = jnp.where(done, z_l, z_new)
            return (k + 1, z_l, r_his, done)

        r_his0 = jnp.full((max_iter,), -1.0, dtype=rhs_l.dtype)
        k, z_l, r_his, _ = jax.lax.while_loop(
            cond, body, (0, z_l, r_his0, jnp.asarray(False))
        )
        return z_l, r_his, k

    def _get_sm(self, max_iter: int):
        if max_iter in self._sm_cache:
            return self._sm_cache[max_iter]
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        def spec_of(v):
            if v.ndim == 0:
                return P()
            if v.ndim == 1:
                return P("rows")
            return P(*(("rows",) + (None,) * (v.ndim - 1)))

        def body(args, rhs_l, z_l, tol):
            lvls, cinv = args
            return self._shard_body(lvls, cinv, rhs_l, z_l, tol, max_iter)

        example_args = (self._lvl_args(), self.coarse_inv)
        arg_specs = jax.tree_util.tree_map(spec_of, example_args)
        kwargs = dict(
            mesh=self.mesh,
            in_specs=(arg_specs, P("rows"), P("rows"), P()),
            out_specs=(P("rows"), P(), P()),
        )
        try:
            sm = shard_map(body, check_vma=False, **kwargs)
        except TypeError:  # older API spelling
            sm = shard_map(body, check_rep=False, **kwargs)
        fn = jax.jit(sm)
        self._sm_cache[max_iter] = fn
        return fn

    def _lvl_args(self):
        return [
            {k: v for k, v in lv.items() if v is not None}
            for lv in self.levels
        ]

    # ------------------------------------------------------------------
    # sharded value refresh on the windowed kernel (slot-space G chain)
    # ------------------------------------------------------------------
    def enable_refresh(self):
        """Build the stacked slot-space Galerkin value chain, after which
        `solve_values(A0_vals, ...)` refreshes every level's operator
        values AND solves inside one shard_map program — entirely on the
        windowed Pallas kernel, with band-segment halos.

        Design (the multi-chip analog of solver/wellrefresh.py): values
        live in per-level ELL-SLOT space (slot (r, k) = r*w + k), so
        device d's slot block [d*R_l*w_l, (d+1)*R_l*w_l) is exactly its
        row block's ELL data — the refreshed slot vector feeds
        well_repack_tap per shard as a pure reshape.  The per-level maps
        (the 0/1 fill from the finest nnz vector, then the PT A P
        contraction weights G_{l+1}) are banded under the global
        induced-RCM ordering, so they stack/halo exactly like A/P/PT.
        Serves the per-step MCF rebuild and the per-Newton balloon
        re-Galerkin (reference 05_example_mean_curvature_flow/main.cpp:74,
        sim_utils/implicit_euler_mg_balloon.h:67-78) at kernel speed
        instead of the serial XLA gathers of parallel/halo.py's refresh.

        Requires the hierarchy's As to carry the full SYMBOLIC PtAP
        pattern (build them with solver.galerkin.galerkin_chain)."""
        from surface_multigrid_code_tpu.solver.galerkin import (
            galerkin_triples,
        )
        from surface_multigrid_code_tpu.solver.refresh import csr_slot_map
        from surface_multigrid_code_tpu.solver.wellrefresh import (
            _diag_slots,
            _slot_space,
        )

        D = self.D
        As, Ps = self._As_perm, self._Ps_perm
        L = len(As)
        dtype = self.dtype
        shard = NamedSharding(self.mesh, P("rows", None))
        vec = NamedSharding(self.mesh, P("rows"))

        def put_well(Ws, R):
            out = []
            for W in _localize(Ws, R):
                out.append(dataclasses.replace(
                    W,
                    rb=jax.device_put(W.rb, vec),
                    hb=jax.device_put(W.hb, vec),
                    hi=jax.device_put(W.hi, shard),
                    lo=jax.device_put(W.lo, shard),
                    dat=jax.device_put(W.dat, shard),
                    ob=None if W.ob is None else jax.device_put(W.ob, vec),
                ))
            return tuple(out)

        # original canonical CSR order -> permuted order (host map)
        A0p = As[0].tocsr()
        A0p.sum_duplicates()
        invp = np.empty(self.n0, dtype=np.int64)
        invp[self.perm0] = np.arange(self.n0)
        orows = np.repeat(
            np.arange(self.n0, dtype=np.int64),
            np.diff(self._A0_orig.indptr),
        )
        slot_of_orig = csr_slot_map(
            A0p, invp[orows], invp[self._A0_orig.indices]
        )
        perm_nnz = np.empty_like(slot_of_orig)
        perm_nnz[slot_of_orig] = np.arange(slot_of_orig.shape[0])
        self._perm_nnz = perm_nnz

        Rin = _pad_to(A0p.nnz, D * B_ROWS) // D
        self._Rin = Rin

        g_wells, g_ex, slot_shapes = [], [], []
        diag_off, diag_valid = [], []

        def add_level_meta(pattern, n_l, w_l, slot):
            ds = _diag_slots(pattern, n_l, w_l, slot)  # global slot ids
            npad = self.Rs[len(slot_shapes) - 1] * D
            off = np.zeros(npad, dtype=np.int32)
            val = np.zeros(npad, dtype=np.float64)
            off[:n_l] = (ds - np.arange(n_l) * w_l).astype(np.int32)
            val[:n_l] = 1.0
            diag_off.append(jax.device_put(jnp.asarray(off), vec))
            diag_valid.append(
                jax.device_put(jnp.asarray(val, dtype=dtype), vec))

        def add_chain_op(G, Rr, Rc):
            lo, hi = _col_extents(G, Rr, Rc, D)
            lo = _pad_to(lo, B_ROWS)
            hi = _pad_to(hi, B_ROWS)
            rep = not (lo <= Rc and hi <= Rc)
            if rep:
                lo = hi = 0
            Gstk = _stack_blocks(G, Rr, Rc, D, lo, hi, rep)
            # cap: G operators are wide (up to ~150 contributions per
            # coarse slot); tighter groups keep Mosaic's scoped-VMEM
            # stack happy (solver/wellrefresh.py uses the same cap)
            g_wells.append(put_well(
                build_well_auto(Gstk, dtype=dtype, cap=2048), Rr))
            g_ex.append((lo, hi, rep))

        # level 0: 0/1 fill from the (permuted-order) nnz vector to slots
        n0s, w0, slot0 = _slot_space(A0p)
        slot_shapes.append((n0s, w0))
        add_level_meta(A0p, n0s, w0, slot0)
        fill = sp.csr_matrix(
            (np.ones(A0p.nnz), (slot0, np.arange(A0p.nnz))),
            shape=(n0s * w0, A0p.nnz),
        )
        add_chain_op(fill, self.Rs[0] * w0, Rin)

        A_sym, prev_slot, prev_w, prev_n = A0p, slot0, w0, n0s
        for lv in range(L - 1):
            seg, in_id, wgt, A_out = galerkin_triples(A_sym, Ps[lv].tocsr())
            stored = As[lv + 1].tocsr()
            stored.sum_duplicates()
            if A_out.nnz != stored.nnz or not (
                np.array_equal(A_out.indptr, stored.indptr)
                and np.array_equal(A_out.indices, stored.indices)
            ):
                raise ValueError(
                    f"level {lv + 1} pattern mismatch (symbolic "
                    f"{A_out.nnz} vs stored {stored.nnz} nnz): build the "
                    "hierarchy's As with solver.galerkin.galerkin_chain"
                )
            nc, wc, slot_c = _slot_space(A_out)
            slot_shapes.append((nc, wc))
            add_level_meta(A_out, nc, wc, slot_c)
            G = sp.coo_matrix(
                (wgt, (slot_c[seg], prev_slot[in_id])),
                shape=(nc * wc, prev_n * prev_w),
            ).tocsr()
            G.sum_duplicates()
            add_chain_op(G, self.Rs[lv + 1] * wc, self.Rs[lv] * prev_w)
            A_sym, prev_slot, prev_w, prev_n = A_out, slot_c, wc, nc

        self._g_ex = tuple(g_ex)
        self._slot_shapes = tuple(slot_shapes)

        # coarsest dense assembly coordinates, per slot (padding slots ->
        # (0, 0) with zero values); SHARDED over slot blocks so each
        # device scatters its partial and the logical dense is psum'd
        AL = A_sym
        nL, wL = slot_shapes[-1]
        self._n_last = nL
        self._coarse_shift = 1e-12
        npadL = self.Rs[-1] * D * wL
        rowsL = np.zeros(npadL, dtype=np.int64)
        colsL = np.zeros(npadL, dtype=np.int64)
        slotL = prev_slot  # of AL
        rL = np.repeat(np.arange(nL, dtype=np.int64), np.diff(AL.indptr))
        rowsL[slotL] = rL
        colsL[slotL] = AL.indices
        self._refresh_state = {
            "G": tuple(g_wells),
            "diag_off": tuple(diag_off),
            "diag_valid": tuple(diag_valid),
            "rowsL": jax.device_put(jnp.asarray(rowsL), vec),
            "colsL": jax.device_put(jnp.asarray(colsL), vec),
        }
        return self

    def _refresh_in_shard(self, rargs, lvl_args, vals_l):
        """Inside shard_map: run the slot-space value chain, repack every
        level's windowed dat (pure reshape), extract diagonals, refresh
        the Chebyshev bound (sharded power iteration + 1.1x margin, the
        same heuristic estimator as solver/refresh._device_lam_max), and
        rebuild the coarse inverse."""
        from surface_multigrid_code_tpu.ops.well import well_repack_tap

        D = self.D
        cfg = self.cfg
        L = len(lvl_args)
        x = vals_l
        new_lvls = []
        for lv in range(L):
            lo, hi, rep = self._g_ex[lv]
            y = well_apply(
                rargs["G"][lv], _exchange_seg(x, lo, hi, rep, D),
                unpadded=False,
            )
            n_l, w_l = self._slot_shapes[lv]
            y2d = y.reshape(self.Rs[lv], w_l)
            la = dict(lvl_args[lv])
            la["Aw"] = well_repack_tap(la["Aw"], y2d.astype(self.dtype))
            off = rargs["diag_off"][lv]
            valid = rargs["diag_valid"][lv]
            dval = jnp.take_along_axis(y2d, off[:, None], axis=1)[:, 0]
            la["diag"] = jnp.where(valid > 0, dval, 1.0).astype(self.dtype)
            if cfg.smoother == SmootherType.CHEBYSHEV and lv < L - 1:
                # sharded power iteration on D^-1 A with the FRESH values
                # — the same estimator (12 iterations, uniform start,
                # 1.1x margin) as the single-chip refresh
                # (solver/refresh._device_lam_max) so Chebyshev iterates
                # match the single-device trajectory
                dinv = 1.0 / la["diag"]
                Aw_new = la["Aw"]
                hlo, hhi, rep = self.hlos[lv], self.hhis[lv], self.reps[lv]
                x0 = valid / jnp.sqrt(
                    jnp.asarray(n_l, dtype=self.dtype))

                def pw_body(i, xl, Aw_new=Aw_new, dinv=dinv, hlo=hlo,
                            hhi=hhi, rep=rep):
                    xx, lam = xl
                    yv = well_apply(
                        Aw_new, _exchange_seg(xx, hlo, hhi, rep, D),
                        unpadded=False,
                    ) * dinv
                    lam = jnp.sqrt(jax.lax.psum((yv * yv).sum(), "rows"))
                    return (yv / lam, lam)

                _, lam = jax.lax.fori_loop(
                    0, 12, pw_body,
                    (x0, jnp.asarray(1.0, dtype=self.dtype)),
                )
                la["lam_max"] = 1.1 * lam
            new_lvls.append(la)
            x = y
        # logical-size coarse dense: per-shard partial scatter + psum,
        # then the SPD Cholesky inverse (solver/refresh.py semantics)
        nL = self._n_last
        dense = jnp.zeros((nL, nL), dtype=self.dtype)
        dense = dense.at[rargs["rowsL"], rargs["colsL"]].add(
            x.astype(self.dtype)
        )
        dense = jax.lax.psum(dense, "rows")
        dense = dense + self._coarse_shift * jnp.eye(nL, dtype=self.dtype)
        chol = jnp.linalg.cholesky(dense)
        cinv = jax.scipy.linalg.cho_solve(
            (chol, True), jnp.eye(nL, dtype=self.dtype)
        )
        return new_lvls, cinv

    def _get_sm_refresh(self, max_iter: int, ndim: int):
        key = ("refresh", max_iter, ndim)
        if key in self._sm_cache:
            return self._sm_cache[key]
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        def spec_of(v):
            if v.ndim == 0:
                return P()
            if v.ndim == 1:
                return P("rows")
            return P(*(("rows",) + (None,) * (v.ndim - 1)))

        def body(rargs, vals_l, args, rhs_l, z_l, tol):
            lvls, _cinv0 = args
            new_lvls, cinv = self._refresh_in_shard(rargs, lvls, vals_l)
            return self._shard_body(
                new_lvls, cinv, rhs_l, z_l, tol, max_iter
            )

        example_args = (self._lvl_args(), self.coarse_inv)
        arg_specs = jax.tree_util.tree_map(spec_of, example_args)
        rspecs = jax.tree_util.tree_map(spec_of, self._refresh_state)
        kwargs = dict(
            mesh=self.mesh,
            in_specs=(rspecs, P("rows"), arg_specs, P("rows"), P("rows"),
                      P()),
            out_specs=(P("rows"), P(), P()),
        )
        try:
            sm = shard_map(body, check_vma=False, **kwargs)
        except TypeError:  # older API spelling
            sm = shard_map(body, check_rep=False, **kwargs)
        fn = jax.jit(sm)
        self._sm_cache[key] = fn
        return fn

    def solve_values(self, A0_vals, rhs, z0=None, tolerance=1e-3,
                     max_iter=20):
        """Refresh all levels from finest nnz values (ORIGINAL canonical
        CSR order of the pattern this hierarchy was built from) + solve,
        in one jitted sharded program.  Requires enable_refresh().
        Mirrors HaloHierarchy.solve_values."""
        assert self._refresh_state is not None, "call enable_refresh() first"
        vals = np.asarray(A0_vals, dtype=np.float64)[self._perm_nnz]
        vals_p = np.zeros(self._Rin * self.D)
        vals_p[: vals.shape[0]] = vals
        rhs = np.asarray(rhs, dtype=np.float64)
        n_pad = self.Rs[0] * self.D
        tail = rhs.shape[1:]
        rhs_p = np.zeros((n_pad,) + tail)
        rhs_p[: self.n0] = rhs[self.perm0]
        z0_p = np.zeros((n_pad,) + tail)
        if z0 is not None:
            z0_p[: self.n0] = np.asarray(z0, dtype=np.float64)[self.perm0]
        fn = self._get_sm_refresh(int(max_iter), rhs.ndim)
        z, r_his, k = fn(
            self._refresh_state,
            jnp.asarray(vals_p, dtype=self.dtype),
            (self._lvl_args(), self.coarse_inv),
            jnp.asarray(rhs_p, dtype=self.dtype),
            jnp.asarray(z0_p, dtype=self.dtype),
            jnp.asarray(float(tolerance), dtype=self.dtype),
        )
        k = int(k)
        r_list = [float(r) for r in np.asarray(r_his)[:k]]
        z_out = np.empty((self.n0,) + tail)
        z_out[self.perm0] = np.asarray(z, dtype=np.float64)[: self.n0]
        return z_out, r_list, bool(r_list and r_list[-1] <= tolerance)

    def solve(self, rhs, z0=None, tolerance=1e-3, max_iter=20):
        """Mirror of HaloHierarchy.solve.  1-D or multi-column RHS; for
        [n, C] systems the stop criterion is the Frobenius residual norm
        shared across columns, matching solver/vcycle.solve_loop and
        the reference loop (src/min_quad_with_fixed_mg.cpp:330-347)."""
        rhs = np.asarray(rhs, dtype=np.float64)
        n_pad = self.Rs[0] * self.D
        tail = rhs.shape[1:]
        rhs_p = np.zeros((n_pad,) + tail)
        rhs_p[: self.n0] = rhs[self.perm0]
        z0_p = np.zeros((n_pad,) + tail)
        if z0 is not None:
            z0_p[: self.n0] = np.asarray(z0, dtype=np.float64)[self.perm0]
        fn = self._get_sm(int(max_iter))
        z, r_his, k = fn(
            (self._lvl_args(), self.coarse_inv),
            jnp.asarray(rhs_p, dtype=self.dtype),
            jnp.asarray(z0_p, dtype=self.dtype),
            jnp.asarray(float(tolerance), dtype=self.dtype),
        )
        k = int(k)
        r_list = [float(r) for r in np.asarray(r_his)[:k]]
        z_out = np.empty((self.n0,) + tail)
        z_out[self.perm0] = np.asarray(z, dtype=np.float64)[: self.n0]
        return z_out, r_list, bool(r_list and r_list[-1] <= tolerance)
