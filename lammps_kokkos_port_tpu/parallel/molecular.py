"""Sharded molecular dynamics: bonded topology + PPPM inside the slab loop.

The molecular extension of parallel/domain.ShardedMD (1-D slab CommBrick
analog), restructured GSPMD-first:

  - shard_map ONLY where per-shard packing is irreducible: migration
    (pack + ppermute, ref: src/comm_brick.cpp exchange), border/ghost
    exchange (ref: borders/forward_comm), the per-shard neighbor build,
    and the short-range force pass (pair + bonded on the halo-extended
    arrays);
  - everything else — velocity-Verlet integration, the global PPPM solve,
    global reductions — lives at the GSPMD level on the [ndev, capS, ...]
    sharded arrays, where XLA inserts the collectives (the sharded-grid
    PPPM of models/pppm.py does its FFT all-to-alls this way; ref:
    src/KSPACE/remap.cpp pencil transposes, SURVEY.md §2.12.6).

Topology across shards (the NTopo analog, ref: src/ntopo_bond_all.cpp:38):
bond/angle/dihedral/improper tables are kept REPLICATED with global atom
TAGS; at every rebuild each shard scatters its local+ghost tags into a
tag -> extended-row map (the Atom::map analog, ref: src/atom_map.cpp) and
re-indexes the tables. A term is evaluated wherever all its atoms resolve
and its force lands only on locally-owned rows (the ghost rows are sliced
off), which reproduces newton-off bonded semantics exactly: every owned
atom receives each of its bonded forces exactly once. Replicating the
tag tables costs O(N_global) memory per shard — the right v1 trade for
TPU (no variable-length bond migration), revisit with tag-range
partitioning at >10M atoms.

Special bonds ride the same map: per-atom 1-2/1-3/1-4 partner TAGS are
replicated and re-indexed per rebuild, so the masked pair list applies
the reference's factor_lj/factor_coul weighting on every shard
(ref: src/neighbor.cpp special_flag semantics).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.state import State
from ..core.topology import SpecialBonds, Topology
from ..models import bonded as bonded_mod
from ..ops import neighbor as nbr
from ..utils.units import get_units

Array = jax.Array


def _pack(idx_key: Array, count_cap: int, *arrays):
    """Stable-compact rows selected by idx_key (invalid = len) into the
    first `count_cap` slots. Returns (packed arrays, valid mask)."""
    order = jnp.sort(idx_key)[:count_cap]
    valid = order < idx_key.shape[0]
    safe = jnp.minimum(order, idx_key.shape[0] - 1)
    out = []
    for a in arrays:
        b = a[safe]
        fill = jnp.zeros((), a.dtype)
        out.append(jnp.where(valid.reshape((-1,) + (1,) * (a.ndim - 1)),
                             b, fill))
    return out, valid


class ShardedMolecularMD:
    """1-D slab-sharded NVE for molecular systems: pair (with special
    weights) + bonded + PPPM every step, sharded-vs-single-chip exact."""

    def __init__(self, state: State, forcefield, mesh: Mesh | None = None,
                 dt: float | None = None, skin: float | None = None,
                 rebuild_every: int = 5, ghost_mult: float = 1.0,
                 cap_mult: float = 1.6, ghost_cap_mult: float = 2.0,
                 mig_cap: int = 256):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("x",))
        self.mesh = mesh
        self.ndev = int(mesh.devices.size)
        if self.ndev < 2:
            raise ValueError("ShardedMolecularMD needs >= 2 shards")
        self.ff = forcefield
        self.units = get_units(state.units_name)
        self.dt = float(dt) if dt is not None else self.units.dt
        self.skin = float(skin) if skin is not None else self.units.skin
        self.rebuild_every = rebuild_every
        self.cutghost = (forcefield.max_cutoff() + self.skin) * ghost_mult
        self.mig_cap = mig_cap
        self.global_state = state
        self.cuts = np.linspace(0.0, 1.0, self.ndev + 1)

        prd = np.asarray(jax.device_get(state.box.prd))
        min_slab = float(np.min(np.diff(self.cuts))) * prd[0]
        if min_slab <= self.cutghost:
            raise ValueError(
                f"slab width {min_slab:.3f} <= ghost cutoff "
                f"{self.cutghost:.3f}: too many shards for this box")
        if self.ndev == 2 and min_slab <= 2.0 * self.cutghost:
            raise ValueError("2-shard slabs must exceed 2x the ghost cutoff")

        self._replicate_topology(state, forcefield)
        self._distribute(state, cap_mult, ghost_cap_mult)
        self._runner_cache = {}
        self.overflow = False

    # -- replicated tag-keyed topology ------------------------------------

    def _replicate_topology(self, state: State, ff):
        n = int(jax.device_get(state.nlocal))
        tag = np.asarray(jax.device_get(state.tag))
        self.ntag = int(tag[:n].max()) if n else 0

        def to_tags(table):
            """(type, local...) -> (type, tag...) rows, dropping padding."""
            t = np.asarray(jax.device_get(table))
            if t.shape[0] == 0:
                return t
            keep = t[:, 0] > 0
            t = t[keep]
            out = t.copy()
            out[:, 1:] = tag[t[:, 1:]]
            return out

        top = ff.topology if ff.topology is not None else Topology.empty()
        self.bonds_t = to_tags(top.bonds)
        self.angles_t = to_tags(top.angles)
        self.dihedrals_t = to_tags(top.dihedrals)
        self.impropers_t = to_tags(top.impropers)

        sp = ff.special
        if sp is not None:
            idx = np.asarray(jax.device_get(sp.idx))
            cls = np.asarray(jax.device_get(sp.cls))
            ms = idx.shape[1]
            stag = np.zeros((self.ntag + 1, ms), dtype=np.int32)
            scls = np.zeros((self.ntag + 1, ms), dtype=np.int32)
            cap = idx.shape[0]
            for i in range(n):
                row = idx[i]
                ok = row < cap
                stag[tag[i], ok] = tag[np.minimum(row, cap - 1)][ok]
                scls[tag[i]] = np.where(ok, cls[i], 0)
            self.stag, self.scls = stag, scls
            self.sp_weights = (tuple(sp.weights_lj), tuple(sp.weights_coul),
                               sp.mode)
        else:
            self.stag = self.scls = None
            self.sp_weights = None

    # -- distribution -------------------------------------------------------

    def _distribute(self, state: State, cap_mult, ghost_cap_mult):
        nd = self.ndev
        n = int(jax.device_get(state.nlocal))
        x = np.asarray(jax.device_get(state.x))[:n]
        v = np.asarray(jax.device_get(state.v))[:n]
        t = np.asarray(jax.device_get(state.type))[:n]
        tg = np.asarray(jax.device_get(state.tag))[:n]
        q = (np.asarray(jax.device_get(state.q))[:n]
             if state.q is not None else None)

        hinv = np.asarray(jax.device_get(state.box.h_inv))
        lo = np.asarray(jax.device_get(state.box.lo))
        lam = (x - lo) @ hinv.T
        lamx = lam[:, 0] - np.floor(lam[:, 0])
        owner = np.clip(np.searchsorted(self.cuts, lamx, side="right") - 1,
                        0, nd - 1)
        counts = np.bincount(owner, minlength=nd)
        capS = int(np.ceil(counts.max() * cap_mult / 8) * 8)
        prd = np.asarray(jax.device_get(state.box.prd))
        dens = n / prd.prod()
        G = int(np.ceil(dens * prd[1] * prd[2] * self.cutghost
                        * ghost_cap_mult / 8) * 8)
        self.capS, self.G = capS, G

        dt_np = np.dtype(state.dtype)
        shape2 = lambda c=None: ((nd, capS) if c is None else (nd, capS, c))
        xs = np.zeros(shape2(3))
        vs = np.zeros(shape2(3))
        ts = np.zeros(shape2(), np.int32)
        tgs = np.zeros(shape2(), np.int32)
        qs = np.zeros(shape2()) if q is not None else None
        ms = np.zeros(shape2(), np.int32)
        for d in range(nd):
            sel = np.flatnonzero(owner == d)
            c = len(sel)
            xs[d, :c] = x[sel]
            vs[d, :c] = v[sel]
            ts[d, :c] = t[sel]
            tgs[d, :c] = tg[sel]
            if qs is not None:
                qs[d, :c] = q[sel]
            ms[d, :c] = 1

        shard = NamedSharding(self.mesh, P("x"))
        rep = NamedSharding(self.mesh, P())
        put = lambda a: jax.device_put(jnp.asarray(a), shard)
        self.xs = put(xs.astype(dt_np))
        self.vs = put(vs.astype(dt_np))
        self.fs = put(np.zeros(shape2(3), dtype=dt_np))
        self.ts = put(ts)
        self.tg = put(tgs)
        self.qs = put(qs.astype(dt_np)) if qs is not None else None
        self.ms = put(ms)
        self.box = jax.device_put(state.box, rep)
        self.mass = jax.device_put(state.mass, rep)
        self.natoms_global = n

        cutneigh = self.ff.max_cutoff() + self.skin
        est = 4.0 / 3.0 * np.pi * cutneigh ** 3 * dens
        K = int(np.ceil(est * 1.6 / 8) * 8)
        next_cap = capS + 2 * G
        self.nparams = nbr.NeighborParams(
            cutneigh=cutneigh, skin=self.skin, every=1, delay=0,
            check=False, K=min(K, next_cap), cell_cap=next_cap,
            ncells=(0, 0, 0))

        # replicated device copies of the tag tables
        putr = lambda a: jax.device_put(jnp.asarray(a), rep)
        self.bonds_j = putr(self.bonds_t.astype(np.int32))
        self.angles_j = putr(self.angles_t.astype(np.int32))
        self.dihedrals_j = putr(self.dihedrals_t.astype(np.int32))
        self.impropers_j = putr(self.impropers_t.astype(np.int32))
        if self.stag is not None:
            self.stag_j = putr(self.stag)
            self.scls_j = putr(self.scls)

    # -- per-shard comm/build phases (inside shard_map) ----------------------

    def _shard_fns(self):
        nd, capS, G, M = self.ndev, self.capS, self.G, self.mig_cap
        box, mesh = self.box, self.mesh
        cuts_j = jnp.asarray(self.cuts,
                             dtype=np.dtype(self.global_state.dtype))
        perm_l = [(i, (i - 1) % nd) for i in range(nd)]
        perm_r = [(i, (i + 1) % nd) for i in range(nd)]
        has_q = self.qs is not None
        arange = jnp.arange(capS, dtype=jnp.int32)
        next_cap = capS + 2 * G
        ff = self.ff
        p = self.nparams
        ntag = self.ntag
        sp_w = self.sp_weights

        def migrate(x, v, typ, tag, q, msk):
            me = jax.lax.axis_index("x")
            overflow = jnp.asarray(False)
            xw, _ = box.wrap(x, None)
            x = jnp.where((msk != 0)[:, None], xw, x)
            lam = box.to_lamda(x)[:, 0]
            lam = lam - jnp.floor(lam)
            owner = jnp.clip(jnp.searchsorted(cuts_j, lam, side="right") - 1,
                             0, nd - 1).astype(jnp.int32)
            exists = msk != 0
            stay = exists & (owner == me)
            dist_l = jnp.mod(cuts_j[me] - lam, 1.0)
            dist_r = jnp.mod(lam - cuts_j[me + 1], 1.0)
            go_l = exists & ~stay & (dist_l <= dist_r)
            go_r = exists & ~stay & (dist_r < dist_l)
            lost = exists & ~stay & ~((owner == jnp.mod(me - 1, nd))
                                      | (owner == jnp.mod(me + 1, nd)))
            overflow = overflow | jnp.any(lost)

            arrays = [x, v, typ, tag] + ([q] if has_q else [])
            packed, _ = _pack(jnp.where(stay, arange, capS), capS, *arrays)
            n_new = jnp.sum(stay).astype(jnp.int32)
            msk2 = (arange < n_new).astype(jnp.int32)
            x2, v2, t2, g2 = packed[:4]
            q2 = packed[4] if has_q else None

            for sel, perm in ((go_l, perm_l), (go_r, perm_r)):
                send, svalid = _pack(jnp.where(sel, arange, capS), M,
                                     *arrays)
                overflow = overflow | (jnp.sum(sel) > M)
                recv = [jax.lax.ppermute(b, "x", perm) for b in send]
                rvalid = jax.lax.ppermute(svalid.astype(jnp.int32), "x",
                                          perm)
                cnt = jnp.sum(rvalid).astype(jnp.int32)
                overflow = overflow | (n_new + cnt > capS)
                slot = n_new + jnp.cumsum(rvalid) - rvalid
                slot = jnp.where(rvalid > 0, slot, capS)
                x2 = x2.at[slot].set(recv[0], mode="drop")
                v2 = v2.at[slot].set(recv[1], mode="drop")
                t2 = t2.at[slot].set(recv[2], mode="drop")
                g2 = g2.at[slot].set(recv[3], mode="drop")
                if has_q:
                    q2 = q2.at[slot].set(recv[4], mode="drop")
                msk2 = msk2.at[slot].set(1, mode="drop")
                n_new = n_new + cnt
            return x2, v2, t2, g2, q2, msk2, overflow

        def borders(x, msk):
            me = jax.lax.axis_index("x")
            prd_x = box.prd[0]
            lam = box.to_lamda(x)[:, 0]
            lam = lam - jnp.floor(lam)
            exists = msk != 0
            gf = self.cutghost / prd_x
            near_lo = exists & (lam < cuts_j[me] + gf)
            near_hi = exists & (lam > cuts_j[me + 1] - gf)

            def mk(sel):
                key = jnp.where(sel, arange, capS)
                if G > capS:  # thin slabs: ghost zone larger than the slab
                    key = jnp.concatenate(
                        [key, jnp.full((G - capS,), capS, jnp.int32)])
                return jnp.sort(key)[:G], jnp.sum(sel)

            sidx_l, cl = mk(near_lo)
            sidx_r, cr = mk(near_hi)
            overflow = (cl > G) | (cr > G)
            shift_l = jnp.where(me == 0, prd_x, 0.0).astype(x.dtype)
            shift_r = jnp.where(me == nd - 1, -prd_x, 0.0).astype(x.dtype)
            return sidx_l, sidx_r, shift_l, shift_r, overflow

        def ghost_exchange(x, typ, tag, q, sidx_l, sidx_r, shift_l,
                           shift_r):
            def pack(sidx, shift):
                valid = sidx < capS
                safe = jnp.minimum(sidx, capS - 1)
                gx = jnp.where(valid[:, None],
                               x[safe] + jnp.stack(
                                   [shift, jnp.zeros_like(shift),
                                    jnp.zeros_like(shift)]), 0.0)
                gt = jnp.where(valid, typ[safe], 0)
                gg = jnp.where(valid, tag[safe], 0)
                gq = jnp.where(valid, q[safe], 0.0) if has_q else None
                gm = valid.astype(jnp.int32)
                return [b for b in (gx, gt, gg, gq, gm) if b is not None]

            gl = pack(sidx_l, shift_l)
            gr = pack(sidx_r, shift_r)
            rl = [jax.lax.ppermute(b, "x", perm_l) for b in gl]
            rr = [jax.lax.ppermute(b, "x", perm_r) for b in gr]
            return rl, rr

        def extend(x, typ, tag, q, msk, rl, rr):
            cat = lambda a, b, c: jnp.concatenate([a, b, c], axis=0)
            if has_q:
                lx, lt, lg, lq, lm = rr  # ghosts FROM the left neighbor
                hx, ht, hg, hq, hm = rl
                q_ext = cat(q, lx * 0.0 if False else lq, hq)
            else:
                lx, lt, lg, lm = rr
                hx, ht, hg, hm = rl
                q_ext = None
            return (cat(x, lx, hx), cat(typ, lt, ht), cat(tag, lg, hg),
                    q_ext, cat(msk, lm, hm))

        def tag_map(tag_ext, m_ext):
            tmap = jnp.full((ntag + 1,), next_cap, dtype=jnp.int32)
            key = jnp.where(m_ext != 0, tag_ext, 0)
            tmap = tmap.at[key].set(
                jnp.arange(next_cap, dtype=jnp.int32), mode="drop")
            return tmap.at[0].set(next_cap)

        def local_topo(tmap, table):
            """(type, tags...) -> (type, ext rows...); unresolved -> type 0
            (bonded_mod masks type 0 and drops rows >= capacity)."""
            if table.shape[0] == 0:
                return table
            t = table[:, 0]
            rows = tmap[table[:, 1:]]
            found = jnp.all(rows < next_cap, axis=1)
            return jnp.concatenate(
                [jnp.where(found, t, 0)[:, None], rows], axis=1)

        def local_special(tmap, tag_ext):
            sidx = tmap[self.stag_j[tag_ext]]  # [next, ms]
            scl = jnp.where(sidx < next_cap, self.scls_j[tag_ext], 0)
            lj_w, coul_w, mode = sp_w
            return SpecialBonds(idx=sidx, cls=scl, weights_lj=lj_w,
                                weights_coul=coul_w, mode=mode)

        def pseudo_state(x_ext, t_ext, m_ext, q_ext):
            return State(
                x=x_ext, v=jnp.zeros_like(x_ext), f=jnp.zeros_like(x_ext),
                type=t_ext, tag=jnp.zeros_like(t_ext),
                image=jnp.zeros(x_ext.shape[:1] + (3,), dtype=jnp.int32),
                q=q_ext, molecule=None, box=box, mass=self.mass,
                nlocal=jnp.asarray(0, jnp.int32), mask=m_ext,
                virial=jnp.zeros(6, dtype=x_ext.dtype),
                ntimestep=jnp.asarray(0, jnp.int32), aux={},
                units_name=self.global_state.units_name,
                dimension=self.global_state.dimension)

        def lead(tree):
            return jax.tree.map(lambda a: a[None], tree)

        def unlead(tree):
            return jax.tree.map(lambda a: a[0], tree)

        def rebuild_sm(core):
            x, v, typ, tag, q, msk = (core["x"][0], core["v"][0],
                                      core["t"][0], core["g"][0],
                                      core["q"][0] if has_q else None,
                                      core["m"][0])
            x, v, typ, tag, q, msk, overflow = migrate(x, v, typ, tag, q,
                                                       msk)
            sidx_l, sidx_r, shl, shr, ovb = borders(x, msk)
            overflow = overflow | ovb
            rl, rr = ghost_exchange(x, typ, tag, q, sidx_l, sidx_r, shl,
                                    shr)
            x_ext, t_ext, g_ext, q_ext, m_ext = extend(x, typ, tag, q, msk,
                                                       rl, rr)
            tmap = tag_map(g_ext, m_ext)
            sp = (local_special(tmap, g_ext)
                  if self.stag is not None else None)
            ps = pseudo_state(x_ext, t_ext, m_ext, q_ext)
            nl = nbr.build(ps, p, special=sp)
            overflow = overflow | nl.overflow
            topo = Topology(
                bonds=local_topo(tmap, self.bonds_j),
                angles=local_topo(tmap, self.angles_j),
                dihedrals=local_topo(tmap, self.dihedrals_j),
                impropers=local_topo(tmap, self.impropers_j))
            core2 = {"x": x, "v": v, "t": typ, "g": tag, "m": msk,
                     "sidx_l": sidx_l, "sidx_r": sidx_r,
                     "shl": shl, "shr": shr}
            if has_q:
                core2["q"] = q
            sp_tree = ((sp.idx, sp.cls) if sp is not None else ())
            return lead((core2, nl, topo, sp_tree, overflow))

        def force_sm(core, nl, topo, sp_tree):
            core, nl, topo, sp_tree = unlead((core, nl, topo, sp_tree))
            x, typ, tag, msk = core["x"], core["t"], core["g"], core["m"]
            q = core["q"] if has_q else None
            rl, rr = ghost_exchange(x, typ, tag, q, core["sidx_l"],
                                    core["sidx_r"], core["shl"],
                                    core["shr"])
            x_ext, t_ext, g_ext, q_ext, m_ext = extend(x, typ, tag, q, msk,
                                                       rl, rr)
            ps = pseudo_state(x_ext, t_ext, m_ext, q_ext)
            nl = nl.replace(xhold=x_ext) if hasattr(nl, "replace") else nl
            slj = scoul = None
            if sp_w is not None:
                slj, scoul, _ = sp_w
            try:
                f_ext, _, _ = ff.pair.compute(ps, nl, False, False,
                                              special_lj=slj,
                                              special_coul=scoul)
            except TypeError:
                f_ext, _, _ = ff.pair.compute(ps, nl, False, False)
            for style, fn in ((ff.bond, bonded_mod.compute_bonds),
                              (ff.angle, bonded_mod.compute_angles)):
                if style is not None:
                    out = fn(style, ps, topo, False, False)
                    if out is not None:
                        f_ext = f_ext + out[0]
            if ff.dihedral is not None:
                out = bonded_mod.compute_dihedrals(
                    ff.dihedral, ps, topo, False, False, which="dihedrals")
                if out is not None:
                    f_ext = f_ext + out[0]
            if ff.improper is not None:
                out = bonded_mod.compute_dihedrals(
                    ff.improper, ps, topo, False, False, which="impropers")
                if out is not None:
                    f_ext = f_ext + out[0]
            return f_ext[:capS][None]

        # pytree-prefix specs: every leaf is per-shard with a leading axis
        self._rebuild_sm = shard_map(rebuild_sm, mesh=mesh,
                                     in_specs=P("x"), out_specs=P("x"),
                                     )
        self._force_sm = shard_map(force_sm, mesh=mesh,
                                   in_specs=P("x"), out_specs=P("x"),
                                   )

    # -- run ------------------------------------------------------------------

    def _get_runner(self, ncycles: int, tail: int):
        key = (ncycles, tail)
        fn = self._runner_cache.get(key)
        if fn is not None:
            return fn
        if not hasattr(self, "_rebuild_sm"):
            self._shard_fns()
        has_q = self.qs is not None
        mass = self.mass
        dtv = self.dt
        dtf = 0.5 * self.dt * self.units.ftm2v
        kspace = self.ff.kspace
        nd, capS = self.ndev, self.capS

        def total_force(core, nl, topo, sp_tree):
            f = self._force_sm(core, nl, topo, sp_tree)
            if kspace is None:
                return f
            st = self.global_state
            msk = core["m"]
            xg = core["x"].reshape(nd * capS, 3)
            qg = jnp.where(msk != 0, core["q"], 0.0).reshape(nd * capS)
            ps = st.replace(
                x=xg, v=jnp.zeros_like(xg), f=jnp.zeros_like(xg),
                q=qg, type=jnp.ones(nd * capS, jnp.int32),
                tag=jnp.zeros(nd * capS, jnp.int32),
                image=jnp.zeros((nd * capS, 3), jnp.int32),
                mask=msk.reshape(nd * capS),
                nlocal=jnp.asarray(nd * capS, jnp.int32),
                virial=jnp.zeros(6, xg.dtype), aux={})
            fk, _, _ = kspace.compute(ps, False, False)
            return f + fk.reshape(nd, capS, 3)

        def inner(carry, _):
            core, nl, topo, sp_tree, f, ovf = carry
            gm = (core["m"] != 0)[..., None]
            minv = 1.0 / mass[core["t"]][..., None]
            v = core["v"] + jnp.where(gm, dtf * f * minv, 0.0)
            x = core["x"] + jnp.where(gm, dtv * v, 0.0)
            core = {**core, "x": x, "v": v}
            f = total_force(core, nl, topo, sp_tree)
            v = core["v"] + jnp.where(gm, dtf * f * minv, 0.0)
            core = {**core, "v": v}
            return (core, nl, topo, sp_tree, f, ovf), None

        def do_rebuild(core, ovf):
            core2, nl, topo, sp_tree, ov = self._rebuild_sm(core)
            return core2, nl, topo, sp_tree, ovf | jnp.any(ov)

        def cycle(carry, _):
            carry, _ = jax.lax.scan(inner, carry, None,
                                    length=self.rebuild_every)
            core, nl, topo, sp_tree, f, ovf = carry
            core, nl, topo, sp_tree, ovf = do_rebuild(core, ovf)
            f = total_force(core, nl, topo, sp_tree)
            return (core, nl, topo, sp_tree, f, ovf), None

        def runner(core):
            core, nl, topo, sp_tree, ovf = do_rebuild(
                core, jnp.asarray(False))
            f = total_force(core, nl, topo, sp_tree)
            carry = (core, nl, topo, sp_tree, f, ovf)
            carry, _ = jax.lax.scan(cycle, carry, None, length=ncycles)
            carry, _ = jax.lax.scan(inner, carry, None, length=tail)
            return carry

        fn = jax.jit(runner)
        self._runner_cache[key] = fn
        return fn

    def run(self, nsteps: int):
        if not hasattr(self, "_rebuild_sm"):
            self._shard_fns()
        R = self.rebuild_every
        ncycles, tail = divmod(nsteps, R)
        runner = self._get_runner(ncycles, tail)
        core = {"x": self.xs, "v": self.vs, "t": self.ts, "g": self.tg,
                "m": self.ms,
                "sidx_l": jnp.zeros((self.ndev, self.G), jnp.int32),
                "sidx_r": jnp.zeros((self.ndev, self.G), jnp.int32),
                "shl": jnp.zeros((self.ndev,),
                                 np.dtype(self.global_state.dtype)),
                "shr": jnp.zeros((self.ndev,),
                                 np.dtype(self.global_state.dtype))}
        if self.qs is not None:
            core["q"] = self.qs
        out_core, nl, topo, sp_tree, f, ovf = runner(core)
        self.overflow = bool(jax.device_get(jnp.any(ovf)))
        if self.overflow:
            raise RuntimeError(
                "sharded molecular capacity overflow (grow caps/ghosts)")
        self.xs, self.vs = out_core["x"], out_core["v"]
        self.ts, self.tg, self.ms = (out_core["t"], out_core["g"],
                                     out_core["m"])
        self.fs = f
        if self.qs is not None:
            self.qs = out_core["q"]

    # -- gather ---------------------------------------------------------------

    def gather(self) -> dict:
        """Host-side global arrays sorted by tag."""
        ms = np.asarray(jax.device_get(self.ms)).reshape(-1) != 0
        flat = lambda a: np.asarray(jax.device_get(a)).reshape(
            (ms.shape[0],) + a.shape[2:])[ms]
        tag = flat(self.tg)
        order = np.argsort(tag)
        out = {"tag": tag[order], "x": flat(self.xs)[order],
               "v": flat(self.vs)[order], "type": flat(self.ts)[order]}
        if self.qs is not None:
            out["q"] = flat(self.qs)[order]
        return out
