"""2-D (x, y) spatial domain decomposition over a device mesh.

Extends the 1-D slab decomposition (parallel/domain.py) to a 2-D
processor grid — the TPU-native analog of the reference's 3-D procgrid
(ref: src/comm.cpp:534-629 Comm::set_proc_grid + src/procmap.cpp; the
per-dimension exchange/border loops of src/comm_brick.cpp:652,771).

Each shard owns a rectangular x-y column of the box. The CommBrick
dim-sequential structure maps directly onto the mesh axes:

  - migration runs dim by dim (x hops over the "x" axis, then y hops
    over "y" — exactly Comm::exchange's per-dim loop);
  - ghost borders run dim by dim WITH FORWARDING: the y-direction bands
    are selected over own atoms PLUS the x-ghosts just received, so
    corner ghosts ride through two ppermutes without a dedicated
    diagonal exchange (ref: comm_brick.cpp:771-870 — "later swaps in a
    dim scan the ghosts just received");
  - PBC shifts are applied at pack time by the sender per dim, so a
    corner ghost that wrapped in both x and y carries both shifts.

Forces use FULL lists + newton off (ghost forces discarded, no reverse
comm) as in the 1-D class. Capacity overflows (migrants / ghosts /
neighbor width) raise the global flag the host heals by growing +
redistributing — the usual clamp-detect-grow-retry idiom.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import State
from ..ops import neighbor as nbr
from ..utils.units import get_units
from .domain import ShardedNVT, _pack

Array = jax.Array


class ShardedMD2D:
    """2-D (x, y) brick-decomposed MD over a device mesh."""

    def __init__(
        self,
        state: State,
        forcefield,
        mesh: Mesh,
        dt: float | None = None,
        skin: float | None = None,
        rebuild_every: int = 10,
        ghost_mult: float = 1.0,
        cap_mult: float = 1.5,
        ghost_cap_mult: float = 2.2,
        mig_cap: int = 256,
        integrator: str = "nve",
        t_target: float | None = None,
        t_period: float | None = None,
    ):
        if tuple(mesh.axis_names) != ("x", "y"):
            raise ValueError("ShardedMD2D needs a mesh with axes ('x','y')")
        self.mesh = mesh
        self.ndx, self.ndy = mesh.devices.shape
        self.ff = forcefield
        self.units = get_units(state.units_name)
        self.dt = float(dt) if dt is not None else self.units.dt
        self.skin = float(skin) if skin is not None else self.units.skin
        self.rebuild_every = rebuild_every
        self.cutghost = (forcefield.max_cutoff() + self.skin) * ghost_mult
        self.global_state = state
        self.mig_cap = mig_cap
        self.integrator_name = integrator
        n_global = int(jax.device_get(state.nlocal))
        self.nvt = None
        if integrator == "nvt":
            self.nvt = ShardedNVT(
                dt=self.dt, units=self.units,
                t_start=float(t_target), t_stop=float(t_target),
                t_period=float(t_period), n_global=n_global,
                axis=("x", "y"))
        elif integrator != "nve":
            raise ValueError(f"2-D sharded integrator {integrator}")

        prd = np.asarray(jax.device_get(state.box.prd))
        for nd_d, L, name in ((self.ndx, prd[0], "x"),
                              (self.ndy, prd[1], "y")):
            if nd_d < 2:
                raise ValueError("ShardedMD2D needs >= 2 shards per axis")
            w = L / nd_d
            if w < self.cutghost:
                raise ValueError(
                    f"{name} sub-box width {w:.3f} below the ghost cutoff "
                    f"{self.cutghost:.3f} (multi-hop forwarding is 1-D "
                    "only; use fewer shards on this axis)")
            if nd_d == 2 and w <= 2.0 * self.cutghost:
                raise ValueError(
                    f"2-shard {name} width {w:.3f} must exceed twice the "
                    f"ghost cutoff {self.cutghost:.3f}")

        self.cap_mult = cap_mult
        self.ghost_cap_mult = ghost_cap_mult
        self.k_mult = 1.5
        self._distribute(state, cap_mult, ghost_cap_mult)
        self._build_runner()

    # -- distribution ------------------------------------------------------

    def _distribute(self, state: State, cap_mult, ghost_cap_mult):
        n = int(jax.device_get(state.nlocal))
        x = np.asarray(jax.device_get(state.x))[:n]
        v = np.asarray(jax.device_get(state.v))[:n]
        t = np.asarray(jax.device_get(state.type))[:n]
        tg = np.asarray(jax.device_get(state.tag))[:n]
        self._distribute_arrays(x, v, t, tg, cap_mult, ghost_cap_mult)

    def _distribute_arrays(self, x, v, t, tg, cap_mult, ghost_cap_mult):
        ndx, ndy = self.ndx, self.ndy
        state = self.global_state
        n = len(x)
        hinv = np.asarray(jax.device_get(state.box.h_inv))
        lo = np.asarray(jax.device_get(state.box.lo))
        lam = (x - lo) @ hinv.T
        lam -= np.floor(lam)
        ox = np.clip((lam[:, 0] * ndx).astype(int), 0, ndx - 1)
        oy = np.clip((lam[:, 1] * ndy).astype(int), 0, ndy - 1)
        owner = ox * ndy + oy
        counts = np.bincount(owner, minlength=ndx * ndy)
        capS = int(np.ceil(counts.max() * cap_mult / 8) * 8)
        prd = np.asarray(jax.device_get(state.box.prd))
        dens = n / prd.prod()
        # x-face band volume per shard, then the y band over own+x-ghosts
        gx_vol = (prd[1] / ndy) * prd[2] * self.cutghost
        gy_vol = (prd[0] / ndx + 2 * self.cutghost) * prd[2] * self.cutghost
        self.Gx = int(np.ceil(dens * gx_vol * ghost_cap_mult / 8) * 8)
        self.Gy = int(np.ceil(dens * gy_vol * ghost_cap_mult / 8) * 8)
        self.capS = capS

        dt_np = np.dtype(state.dtype)
        sh = lambda c=None: ((ndx, ndy, capS) if c is None
                             else (ndx, ndy, capS, c))
        xs = np.zeros(sh(3)); vs = np.zeros(sh(3))
        ts = np.zeros(sh(), np.int32); tgs = np.zeros(sh(), np.int32)
        ms = np.zeros(sh(), np.int32)
        nloc = np.zeros((ndx, ndy), np.int32)
        for dx_ in range(ndx):
            for dy_ in range(ndy):
                sel = np.flatnonzero((ox == dx_) & (oy == dy_))
                c = len(sel)
                xs[dx_, dy_, :c] = x[sel]
                vs[dx_, dy_, :c] = v[sel]
                ts[dx_, dy_, :c] = t[sel]
                tgs[dx_, dy_, :c] = tg[sel]
                ms[dx_, dy_, :c] = 1
                nloc[dx_, dy_] = c

        shard = NamedSharding(self.mesh, P("x", "y"))
        rep = NamedSharding(self.mesh, P())
        put = lambda a: jax.device_put(jnp.asarray(a), shard)
        self.xs = put(xs.astype(dt_np))
        self.vs = put(vs.astype(dt_np))
        self.fs = put(np.zeros(sh(3), dtype=dt_np))
        self.ts = put(ts)
        self.tg = put(tgs)
        self.ms = put(ms)
        self.nloc = put(nloc)
        self.box = jax.device_put(state.box, rep)
        self.mass = jax.device_put(state.mass, rep)
        self.natoms_global = n
        mt = self.nvt.mtchain if self.nvt is not None else 1
        self.eta = put(np.zeros((ndx, ndy, mt)))
        self.etad = put(np.zeros((ndx, ndy, 2 * mt + 3)))
        if self.nvt is not None:
            self._refresh_nh()

        cutneigh = self.ff.max_cutoff() + self.skin
        est = 4.0 / 3.0 * np.pi * cutneigh ** 3 * dens
        K = int(np.ceil(est * self.k_mult / 8) * 8)
        capE = capS + 2 * self.Gx + 2 * self.Gy
        self.nparams = nbr.NeighborParams(
            cutneigh=cutneigh, skin=self.skin, every=1, delay=0,
            check=False, K=min(K, capE), cell_cap=capE, ncells=(0, 0, 0))

    def _refresh_nh(self):
        nvt = self.nvt
        mt = nvt.mtchain
        vs = np.asarray(jax.device_get(self.vs))
        ts = np.asarray(jax.device_get(self.ts))
        ms = np.asarray(jax.device_get(self.ms))
        mass = np.asarray(jax.device_get(self.mass))
        own = ms != 0
        ke = float(np.sum(np.where(own, mass[ts]
                                   * np.sum(vs * vs, axis=-1), 0.0)))
        extra = nvt.extra_dof if nvt.extra_dof is not None else 3
        tdof = 3 * nvt.n_global - extra
        t_cur = self.units.mvv2e * ke / (tdof * self.units.boltz)
        etad = np.array(jax.device_get(self.etad))
        kt = self.units.boltz * nvt.t_start
        qk = kt / (nvt.t_freq * nvt.t_freq)
        q0 = tdof * kt / (nvt.t_freq * nvt.t_freq)
        for ich in range(1, mt):
            qprev = q0 if ich == 1 else qk
            etad[..., mt + 1 + ich] = (
                qprev * etad[..., ich - 1] ** 2 - kt) / qk
        etad[..., 2 * mt + 1] = t_cur
        etad[..., 2 * mt + 2] = nvt.t_start
        self.etad = jax.device_put(
            jnp.asarray(etad), NamedSharding(self.mesh, P("x", "y")))

    # -- the sharded step program -----------------------------------------

    def _build_runner(self):
        ndx, ndy = self.ndx, self.ndy
        capS, Gx, Gy, M = self.capS, self.Gx, self.Gy, self.mig_cap
        box = self.box
        mass = self.mass
        ff = self.ff
        units = self.units
        dtv = self.dt
        dtf = 0.5 * self.dt * units.ftm2v
        p = self.nparams
        dt_np = np.dtype(self.global_state.dtype)
        nvt = self.nvt
        mt_nh = nvt.mtchain if nvt is not None else 1

        perm = {
            ("x", -1): [(i, (i - 1) % ndx) for i in range(ndx)],
            ("x", +1): [(i, (i + 1) % ndx) for i in range(ndx)],
            ("y", -1): [(i, (i - 1) % ndy) for i in range(ndy)],
            ("y", +1): [(i, (i + 1) % ndy) for i in range(ndy)],
        }
        nd_of = {"x": ndx, "y": ndy}
        dim_of = {"x": 0, "y": 1}
        cuts = {
            "x": jnp.asarray(np.linspace(0, 1, ndx + 1), dt_np),
            "y": jnp.asarray(np.linspace(0, 1, ndy + 1), dt_np),
        }

        def pseudo_state(x_ext, t_ext, m_ext, nloc):
            return State(
                x=x_ext, v=jnp.zeros_like(x_ext), f=jnp.zeros_like(x_ext),
                type=t_ext, tag=jnp.zeros_like(t_ext),
                image=jnp.zeros(x_ext.shape[:1] + (3,), dtype=jnp.int32),
                q=None, molecule=None, box=box, mass=mass,
                nlocal=nloc, mask=m_ext,
                virial=jnp.zeros(6, dtype=x_ext.dtype),
                ntimestep=jnp.asarray(0, jnp.int32), aux={},
                units_name=self.global_state.units_name,
                dimension=self.global_state.dimension,
            )

        def shard_body(xs, vs, fs, ts, tg, ms, nloc, etas, etads):
            x = xs[0, 0]
            v = vs[0, 0]
            f = fs[0, 0]
            typ = ts[0, 0]
            tag = tg[0, 0]
            msk = ms[0, 0]
            me = {"x": jax.lax.axis_index("x"),
                  "y": jax.lax.axis_index("y")}
            overflow = jnp.asarray(False)
            arange = jnp.arange(capS, dtype=jnp.int32)

            def migrate_dim(axis, x, v, typ, tag, msk, n, overflow):
                """One CommBrick exchange pass along `axis`."""
                d = dim_of[axis]
                nd_d = nd_of[axis]
                lam = box.to_lamda(x)[:, d]
                lam = lam - jnp.floor(lam)
                owner = jnp.clip(
                    jnp.searchsorted(cuts[axis], lam, side="right") - 1,
                    0, nd_d - 1).astype(jnp.int32)
                exists = msk != 0
                stay = exists & (owner == me[axis])
                go_l = exists & ~stay & (owner == jnp.mod(me[axis] - 1,
                                                          nd_d))
                go_r = exists & ~stay & (owner == jnp.mod(me[axis] + 1,
                                                          nd_d))
                lost = exists & ~stay & ~go_l & ~go_r
                overflow = overflow | jnp.any(lost)

                def keysort(sel):
                    return jnp.where(sel, arange, capS)

                arrays = [x, v, typ, tag]
                packed, _ = _pack(keysort(stay), capS, *arrays)
                n_new = jnp.sum(stay).astype(jnp.int32)
                sides = [(go_l, perm[(axis, -1)])]
                if nd_d != 2:
                    sides.append((go_r, perm[(axis, +1)]))
                x2, v2, t2, g2 = packed
                msk2 = (arange < n_new).astype(jnp.int32)
                for sel, pm in sides:
                    send, svalid = _pack(keysort(sel), M, *arrays)
                    cnt = jnp.sum(sel).astype(jnp.int32)
                    overflow = overflow | (cnt > M)
                    recv = [jax.lax.ppermute(b, axis, pm) for b in send]
                    rvalid = jax.lax.ppermute(
                        svalid.astype(jnp.int32), axis, pm)
                    rcnt = jnp.sum(rvalid).astype(jnp.int32)
                    overflow = overflow | (n_new + rcnt > capS)
                    slot = n_new + jnp.cumsum(rvalid) - rvalid
                    slot = jnp.where(rvalid > 0, slot, capS)
                    x2 = x2.at[slot].set(recv[0], mode="drop")
                    v2 = v2.at[slot].set(recv[1], mode="drop")
                    t2 = t2.at[slot].set(recv[2], mode="drop")
                    g2 = g2.at[slot].set(recv[3], mode="drop")
                    msk2 = msk2.at[slot].set(1, mode="drop")
                    n_new = n_new + rcnt
                return x2, v2, t2, g2, msk2, n_new, overflow

            def migrate(x, v, typ, tag, msk, n, overflow):
                xw, _ = box.wrap(x, None)
                x = jnp.where((msk != 0)[:, None], xw, x)
                x, v, typ, tag, msk, n, overflow = migrate_dim(
                    "x", x, v, typ, tag, msk, n, overflow)
                x, v, typ, tag, msk, n, overflow = migrate_dim(
                    "y", x, v, typ, tag, msk, n, overflow)
                return x, v, typ, tag, msk, n, overflow

            def band_sel(axis, x, valid, nrows):
                """(sel_lo, sel_hi): rows within cutghost of the own
                sub-box's lo/hi face along `axis`."""
                d = dim_of[axis]
                lam = box.to_lamda(x)[:, d]
                lam = lam - jnp.floor(lam)
                gf = self.cutghost / box.prd[d]
                lo_edge = cuts[axis][me[axis]]
                hi_edge = cuts[axis][me[axis] + 1]
                d_lo = jnp.mod(lam - lo_edge, 1.0)
                d_hi = jnp.mod(hi_edge - lam, 1.0)
                return valid & (d_lo < gf), valid & (d_hi < gf)

            def mk_sidx(sel, rows, cap_g):
                key = jnp.where(sel, jnp.arange(rows, dtype=jnp.int32),
                                rows)
                if cap_g > rows:
                    key = jnp.concatenate(
                        [key, jnp.full((cap_g - rows,), rows, jnp.int32)])
                idx = jnp.sort(key)[:cap_g]
                return idx, jnp.sum(sel).astype(jnp.int32)

            def borders(x, typ, msk, overflow):
                """Dim-sequential send lists. x-bands over own atoms;
                y-bands over own + x-ghosts (corner forwarding)."""
                valid = msk != 0
                sel_xl, sel_xr = band_sel("x", x, valid, capS)
                sidx_xl, cl = mk_sidx(sel_xl, capS, Gx)
                sidx_xr, cr = mk_sidx(sel_xr, capS, Gx)
                overflow = overflow | (cl > Gx) | (cr > Gx)
                # provisional x-ghost exchange to place y-band candidates
                x1, t1, m1 = ghost_x(x, typ, msk, sidx_xl, sidx_xr)
                rows1 = capS + 2 * Gx
                valid1 = m1 != 0
                sel_yl, sel_yr = band_sel("y", x1, valid1, rows1)
                sidx_yl, cyl = mk_sidx(sel_yl, rows1, Gy)
                sidx_yr, cyr = mk_sidx(sel_yr, rows1, Gy)
                overflow = overflow | (cyl > Gy) | (cyr > Gy)
                return sidx_xl, sidx_xr, sidx_yl, sidx_yr, overflow

            def pack_ghost(x_src, t_src, m_src, sidx, rows, axis, sign):
                """Gather the send list, apply the sender-side periodic
                shift for wrap crossings, ppermute along `axis`."""
                d = dim_of[axis]
                nd_d = nd_of[axis]
                valid = sidx < rows
                safe = jnp.minimum(sidx, rows - 1)
                shift = jnp.where(
                    (me[axis] == 0) if sign < 0 else
                    (me[axis] == nd_d - 1),
                    jnp.asarray(box.prd[d] * (1.0 if sign < 0 else -1.0),
                                x_src.dtype),
                    jnp.asarray(0.0, x_src.dtype))
                gx_ = x_src[safe]
                gx_ = gx_.at[:, d].add(shift)
                gx_ = jnp.where(valid[:, None], gx_, 0.0)
                gt_ = jnp.where(valid, t_src[safe], 0)
                gm_ = valid.astype(jnp.int32) * jnp.where(
                    valid, m_src[safe], 0)
                pm = perm[(axis, -1 if sign < 0 else +1)]
                return (jax.lax.ppermute(gx_, axis, pm),
                        jax.lax.ppermute(gt_, axis, pm),
                        jax.lax.ppermute(gm_, axis, pm))

            def ghost_x(x, typ, msk, sidx_xl, sidx_xr):
                bl = pack_ghost(x, typ, msk, sidx_xl, capS, "x", -1)
                br = pack_ghost(x, typ, msk, sidx_xr, capS, "x", +1)
                x1 = jnp.concatenate([x, bl[0], br[0]], axis=0)
                t1 = jnp.concatenate([typ, bl[1], br[1]], axis=0)
                m1 = jnp.concatenate([msk, bl[2], br[2]], axis=0)
                return x1, t1, m1

            def ghost_all(x, typ, msk, sidx_xl, sidx_xr, sidx_yl, sidx_yr):
                x1, t1, m1 = ghost_x(x, typ, msk, sidx_xl, sidx_xr)
                rows1 = capS + 2 * Gx
                bl = pack_ghost(x1, t1, m1, sidx_yl, rows1, "y", -1)
                br = pack_ghost(x1, t1, m1, sidx_yr, rows1, "y", +1)
                x2 = jnp.concatenate([x1, bl[0], br[0]], axis=0)
                t2 = jnp.concatenate([t1, bl[1], br[1]], axis=0)
                m2 = jnp.concatenate([m1, bl[2], br[2]], axis=0)
                return x2, t2, m2

            def rebuild(carry):
                (x, v, f, typ, tag, msk, n, nh, _, _, _, _, _,
                 overflow) = carry
                x, v, typ, tag, msk, n, overflow = migrate(
                    x, v, typ, tag, msk, n, overflow)
                sxl, sxr, syl, syr, overflow = borders(x, typ, msk,
                                                       overflow)
                x_ext, t_ext, m_ext = ghost_all(x, typ, msk, sxl, sxr,
                                                syl, syr)
                ps = pseudo_state(x_ext, t_ext, m_ext, n)
                nl = nbr.build(ps, p, special=ff.special)
                overflow = overflow | nl.overflow
                return (x, v, f, typ, tag, msk, n, nh,
                        sxl, sxr, syl, syr, nl, overflow)

            def force_eval(carry):
                (x, v, f, typ, tag, msk, n, nh,
                 sxl, sxr, syl, syr, nl, overflow) = carry
                x_ext, t_ext, m_ext = ghost_all(x, typ, msk, sxl, sxr,
                                                syl, syr)
                ps = pseudo_state(x_ext, t_ext, m_ext, n)
                f_ext, _, _, _ = ff.compute(ps, nl, False, False)
                f = f_ext[:capS]
                return (x, v, f, typ, tag, msk, n, nh,
                        sxl, sxr, syl, syr, nl, overflow)

            def integ_state(x, v, f, typ, msk, nh):
                packed = nh[1]
                return State(
                    x=x, v=v, f=f, type=typ, tag=jnp.zeros_like(typ),
                    image=jnp.zeros(x.shape[:1] + (3,), dtype=jnp.int32),
                    q=None, molecule=None, box=box, mass=mass,
                    nlocal=jnp.asarray(0, jnp.int32), mask=msk,
                    virial=jnp.zeros(6, dtype=x.dtype),
                    ntimestep=jnp.asarray(0, jnp.int32),
                    aux={"nh": {
                        "eta": nh[0],
                        "eta_dot": packed[:mt_nh + 1],
                        "eta_dotdot": packed[mt_nh + 1:2 * mt_nh + 1],
                        "t_cur": packed[2 * mt_nh + 1],
                        "t_tgt": packed[2 * mt_nh + 2]},
                        "nh_run": jnp.zeros(2, dtype=jnp.int32)},
                    units_name=self.global_state.units_name,
                    dimension=self.global_state.dimension,
                )

            def repack_nh(ps):
                d = ps.aux["nh"]
                return (d["eta"], jnp.concatenate([
                    d["eta_dot"], d["eta_dotdot"],
                    jnp.stack([d["t_cur"], d["t_tgt"]])]))

            def inner_step(carry, _):
                (x, v, f, typ, tag, msk, n, nh, *rest) = carry
                gm = (msk != 0)[:, None]
                if nvt is not None:
                    ps = integ_state(x, v, f, typ, msk, nh)
                    ps = nvt.initial_integrate(ps)
                    x, v = ps.x, ps.v
                    nh = repack_nh(ps)
                else:
                    minv = 1.0 / mass[typ][:, None]
                    v = v + jnp.where(gm, dtf * f * minv, 0.0)
                    x = x + jnp.where(gm, dtv * v, 0.0)
                carry = (x, v, f, typ, tag, msk, n, nh, *rest)
                carry = force_eval(carry)
                (x, v, f0, typ, tag, msk, n, nh, *rest) = carry
                if nvt is not None:
                    ps = integ_state(x, v, f0, typ, msk, nh)
                    ps = nvt.final_integrate(ps)
                    v = ps.v
                    nh = repack_nh(ps)
                else:
                    minv = 1.0 / mass[typ][:, None]
                    v = v + jnp.where(gm, dtf * f0 * minv, 0.0)
                return (x, v, f0, typ, tag, msk, n, nh, *rest), None

            def cycle(carry, _):
                carry, _ = jax.lax.scan(inner_step, carry, None,
                                        length=self.rebuild_every)
                carry = rebuild(carry)
                carry = force_eval(carry)
                return carry, None

            dummy_x = jnp.full((Gx,), capS, dtype=jnp.int32)
            dummy_y = jnp.full((Gy,), capS + 2 * Gx, dtype=jnp.int32)
            nh0 = (etas[0, 0], etads[0, 0])
            carry = (x, v, f, typ, tag, msk, nloc[0, 0], nh0,
                     dummy_x, dummy_x, dummy_y, dummy_y, None, overflow)
            carry = rebuild(carry)
            carry = force_eval(carry)
            carry, _ = jax.lax.scan(cycle, carry, None,
                                    length=self._ncycles)
            carry, _ = jax.lax.scan(inner_step, carry, None,
                                    length=self._tail)
            (x, v, f, typ, tag, msk, n, nh, *_, overflow) = carry
            expand = lambda a: a[None, None]
            return (expand(x), expand(v), expand(f), expand(typ),
                    expand(tag), expand(msk), expand(n),
                    expand(overflow), expand(nh[0]), expand(nh[1]))

        self._shard_body = shard_body
        self._runner_cache = {}

    def _get_runner(self, ncycles: int, tail: int):
        fn = self._runner_cache.get((ncycles, tail))
        if fn is None:
            self._ncycles = ncycles
            self._tail = tail
            specs = P("x", "y")
            body = jax.shard_map(
                self._shard_body, mesh=self.mesh,
                in_specs=(specs,) * 9, out_specs=(specs,) * 10,
                check_vma=False)
            fn = jax.jit(body)
            self._runner_cache[(ncycles, tail)] = fn
        return fn

    def run(self, nsteps: int, max_grows: int = 6):
        if nsteps <= 0:
            return 0
        if self.nvt is not None:
            self._refresh_nh()
        ncycles, tail = divmod(nsteps, self.rebuild_every)
        for _ in range(max_grows + 1):
            runner = self._get_runner(ncycles, tail)
            out = runner(self.xs, self.vs, self.fs, self.ts, self.tg,
                         self.ms, self.nloc, self.eta, self.etad)
            overflow = bool(np.any(jax.device_get(out[7])))
            if not overflow:
                (self.xs, self.vs, self.fs, self.ts, self.tg, self.ms,
                 self.nloc, _, self.eta, self.etad) = out
                return nsteps
            self._grow()
        raise RuntimeError("2-D sharded capacity growth did not converge")

    def _grow(self, factor: float = 1.3):
        full = self._gather_arrays()
        eta, etad = jax.device_get((self.eta, self.etad))
        self.cap_mult *= factor
        self.ghost_cap_mult *= factor
        self.k_mult *= factor
        self.mig_cap = int(np.ceil(self.mig_cap * factor / 8) * 8)
        self._distribute_arrays(full["x"], full["v"], full["type"],
                                full["tag"], self.cap_mult,
                                self.ghost_cap_mult)
        shard = NamedSharding(self.mesh, P("x", "y"))
        self.eta = jax.device_put(jnp.asarray(np.asarray(eta)), shard)
        self.etad = jax.device_put(jnp.asarray(np.asarray(etad)), shard)
        self._runner_cache.clear()
        self._build_runner()

    def _gather_arrays(self) -> dict:
        ms = np.asarray(jax.device_get(self.ms)).reshape(-1)
        sel = ms != 0
        flat = lambda a: np.asarray(jax.device_get(a)).reshape(
            (-1,) + a.shape[3:])[sel]
        return {"x": flat(self.xs), "v": flat(self.vs),
                "type": flat(self.ts), "tag": flat(self.tg)}

    def gather(self) -> dict:
        out = self._gather_arrays()
        order = np.argsort(out["tag"])
        return {k: v[order] for k, v in out.items()}
