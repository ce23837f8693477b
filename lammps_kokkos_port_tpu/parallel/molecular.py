"""Sharded molecular dynamics: bonded topology + PPPM inside the slab loop.

The molecular extension of parallel/domain.ShardedMD (1-D slab CommBrick
analog), restructured GSPMD-first:

  - shard_map ONLY where per-shard packing is irreducible: migration
    (pack + ppermute, ref: src/comm_brick.cpp exchange), border/ghost
    exchange (ref: borders/forward_comm), the per-shard neighbor build,
    the short-range force pass (pair + bonded on the halo-extended
    arrays), and the SHAKE cluster solve;
  - everything else — velocity-Verlet / Nose-Hoover integration, the
    global PPPM solve, global reductions (temperature, pressure) — lives
    at the GSPMD level on the [ndev, capS, ...] sharded arrays, where XLA
    inserts the collectives (the sharded-grid PPPM of models/pppm.py does
    its FFT all-to-alls this way; ref: src/KSPACE/remap.cpp pencil
    transposes, SURVEY.md §2.12.6).

Integrators: the `integrator` argument accepts any integrate.verlet
Integrator — including FixNVT / FixNPT / FixNPH (integrate/nh.py). The
Nose-Hoover math runs UNMODIFIED on a "global view" State assembled from
the flat sharded arrays: the chain scalars are replicated, the per-atom
kicks/drifts/rescales are elementwise on sharded arrays, and the
temperature / pressure reductions become XLA psums. The NPT box remap
(ref: src/fix_nh.cpp:1068) dilates every shard's coordinates about the
box center; slab ownership is expressed in fractional (lamda) coordinates
so it is invariant under the dilation — the analog of the reference
remapping sub-domain bounds in lamda space (src/domain.cpp x2lamda of
subbox bounds).

Virial for the barostat (ref: src/compute_pressure.cpp):
  - pair: per-pair 0.5-weight tally over OWNED rows only (the pseudo
    state's nlocal is set to capS so state.owned_mask excludes ghosts);
    the per-shard partial sums add up to the exact global tally.
  - bonded: terms are evaluated-for-force wherever they resolve, but
    tallied-for-virial only on the shard that OWNS the term's first atom
    (a canonical single count; the reference's newton-off ev_tally
    fractional convention sums to the same global total).
  - kspace: the global sharded-grid PPPM virial, computed once at GSPMD
    level. PPPM must be built with dynamic=True under a barostat so the
    influence function tracks the traced box (models/pppm.py).
  - SHAKE constraint virial is not tallied (matching the single-chip
    runner, whose force_fn supplies the virial before post_force fixes).

SHAKE across shards (ref: src/fix_shake.cpp + its comm hooks): cluster
atom TAGS are replicated like the bonded tables; each rebuild re-indexes
them through the tag map. A cluster resolves on every shard that sees all
its atoms (cluster extent << cutghost, so the owner of any cluster atom
always resolves it); the constraint force lands only on locally-owned
rows — each owned atom receives its constraint force exactly once. The
solve needs authoritative v and f of ghost cluster atoms, so the SHAKE
phase ships (x, v, f) through one extra border exchange per step (the
analog of FixShake's forward comm of xshake, fix_shake.cpp:1556).

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

import dataclasses

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
    """1-D slab-sharded molecular MD: pair (with special weights) + bonded
    + PPPM every step, with NVE (default), NVT, or NPT+SHAKE integration,
    sharded-vs-single-chip exact."""

    def __init__(self, state: State, forcefield, mesh: Mesh | None = None,
                 dt: float | None = None, skin: float | None = None,
                 rebuild_every: int = 5, ghost_mult: float = 1.0,
                 cap_mult: float = 1.6, ghost_cap_mult: float = 2.0,
                 mig_cap: int = 256, integrator=None, shake=None):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("x",))
        self.mesh = mesh
        self.ndev = int(mesh.devices.size)
        if self.ndev < 2:
            raise ValueError("ShardedMolecularMD needs >= 2 shards")
        self.ff = forcefield
        self.units = get_units(state.units_name)
        self.integrator = integrator
        self.shake = shake
        self._vflag = bool(integrator is not None
                           and getattr(integrator, "needs_virial", False))
        if integrator is not None:
            self.dt = float(integrator.dt)
        else:
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
        self._nh_aux = None
        self._ntimestep = int(jax.device_get(state.ntimestep))

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

        # SHAKE cluster tags (ref: fix_shake.cpp shake_atom tags)
        if self.shake is not None and self.shake.atoms.shape[0]:
            a = np.asarray(jax.device_get(self.shake.atoms))  # [NCL, 4]
            cap = int(state.x.shape[0])
            at = np.zeros_like(a)
            real = a < cap
            at[real] = tag[a[real]]
            self.shake_tags = at  # pad slots -> tag 0 (tmap[0] is pinned)
        else:
            self.shake_tags = None

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
        if self.shake_tags is not None:
            self.shake_tags_j = putr(self.shake_tags.astype(np.int32))

    # -- per-shard comm/build phases (inside shard_map) ----------------------

    def _shard_fns(self):
        nd, capS, G, M = self.ndev, self.capS, self.G, self.mig_cap
        mesh = self.mesh
        dt_np = np.dtype(self.global_state.dtype)
        cuts_j = jnp.asarray(self.cuts, dtype=dt_np)
        perm_l = [(i, (i - 1) % nd) for i in range(nd)]
        perm_r = [(i, (i + 1) % nd) for i in range(nd)]
        has_q = self.qs is not None
        arange = jnp.arange(capS, dtype=jnp.int32)
        next_cap = capS + 2 * G
        ff = self.ff
        p = self.nparams
        ntag = self.ntag
        sp_w = self.sp_weights
        vflag = self._vflag
        shake = self.shake
        has_shake = self.shake_tags is not None

        def migrate(box, x, v, typ, tag, q, msk):
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

        def borders(box, x, msk):
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

        def pack_side(arrays, x_shift, sidx, shift):
            """Gather border rows; the FIRST array is x (gets the periodic
            x-shift), the rest ship verbatim."""
            valid = sidx < capS
            safe = jnp.minimum(sidx, capS - 1)
            out = []
            for i, a in enumerate(arrays):
                g = a[safe]
                if i == 0 and x_shift:
                    g = g + jnp.stack([shift, jnp.zeros_like(shift),
                                       jnp.zeros_like(shift)])
                fill = jnp.zeros((), a.dtype)
                out.append(jnp.where(
                    valid.reshape((-1,) + (1,) * (a.ndim - 1)), g, fill))
            return out

        def exchange(arrays, sidx_l, sidx_r, shl, shr, x_shift=True):
            """Border-exchange a list of per-atom arrays; returns the two
            received ghost blocks (from-left, from-right) in EXTEND order."""
            gl = pack_side(arrays, x_shift, sidx_l, shl)
            gr = pack_side(arrays, x_shift, sidx_r, shr)
            rl = [jax.lax.ppermute(b, "x", perm_l) for b in gl]
            rr = [jax.lax.ppermute(b, "x", perm_r) for b in gr]
            # ghosts FROM the left neighbor arrive via the rightward perm
            return rr, rl

        def ghost_mask(sidx_l, sidx_r):
            ml = (sidx_l < capS).astype(jnp.int32)
            mr = (sidx_r < capS).astype(jnp.int32)
            rl = jax.lax.ppermute(mr, "x", perm_r)
            rr = jax.lax.ppermute(ml, "x", perm_l)
            return rl, rr

        def tag_map(tag_ext, m_ext):
            tmap = jnp.full((ntag + 1,), next_cap, dtype=jnp.int32)
            key = jnp.where(m_ext != 0, tag_ext, 0)
            tmap = tmap.at[key].set(
                jnp.arange(next_cap, dtype=jnp.int32), mode="drop")
            return tmap.at[0].set(next_cap)

        def local_topo(tmap, table, canon=False):
            """(type, tags...) -> (type, ext rows...); unresolved -> type 0
            (bonded_mod masks type 0 and drops rows >= capacity). With
            `canon`, additionally zero terms whose FIRST atom is a ghost —
            the single-count table for energy/virial tallies."""
            if table.shape[0] == 0:
                return table
            t = table[:, 0]
            rows = tmap[table[:, 1:]]
            found = jnp.all(rows < next_cap, axis=1)
            if canon:
                found = found & (rows[:, 0] < capS)
            return jnp.concatenate(
                [jnp.where(found, t, 0)[:, None], rows], axis=1)

        def local_special(tmap, tag_ext):
            sidx = tmap[self.stag_j[tag_ext]]  # [next, ms]
            scl = jnp.where(sidx < next_cap, self.scls_j[tag_ext], 0)
            lj_w, coul_w, mode = sp_w
            return SpecialBonds(idx=sidx, cls=scl, weights_lj=lj_w,
                                weights_coul=coul_w, mode=mode)

        def local_shake(tmap):
            rows = tmap[self.shake_tags_j]  # [NCL, 4]
            # a cluster is active here only when EVERY real slot resolved
            # (pad slots carry tag 0 -> row next_cap, excluded via nc)
            pad = self.shake_tags_j == 0
            ok = jnp.all((rows < next_cap) | pad, axis=1)
            nc = jnp.where(ok, shake.nc, 0)
            rows = jnp.where(ok[:, None], rows, next_cap)
            return rows, nc

        def pseudo_state(box, x_ext, t_ext, m_ext, q_ext):
            return State(
                x=x_ext, v=jnp.zeros_like(x_ext), f=jnp.zeros_like(x_ext),
                type=t_ext, tag=jnp.zeros_like(t_ext),
                image=jnp.zeros(x_ext.shape[:1] + (3,), dtype=jnp.int32),
                q=q_ext, molecule=None, box=box, mass=self.mass,
                nlocal=jnp.asarray(capS, jnp.int32), mask=m_ext,
                virial=jnp.zeros(6, dtype=x_ext.dtype),
                ntimestep=jnp.asarray(0, jnp.int32), aux={},
                units_name=self.global_state.units_name,
                dimension=self.global_state.dimension)

        def lead(tree):
            return jax.tree.map(lambda a: a[None], tree)

        def unlead(tree):
            return jax.tree.map(lambda a: a[0], tree)

        def rebuild_sm(core, box):
            core = unlead(core)
            x, v, typ, tag, q, msk = (core["x"], core["v"], core["t"],
                                      core["g"],
                                      core["q"] if has_q else None,
                                      core["m"])
            x, v, typ, tag, q, msk, overflow = migrate(box, x, v, typ, tag,
                                                       q, msk)
            sidx_l, sidx_r, shl, shr, ovb = borders(box, x, msk)
            overflow = overflow | ovb
            arrays = [x, typ, tag] + ([q] if has_q else [])
            rl, rr = exchange(arrays, sidx_l, sidx_r, shl, shr)
            ml, mr = ghost_mask(sidx_l, sidx_r)
            cat = lambda a, b, c: jnp.concatenate([a, b, c], axis=0)
            x_ext = cat(x, rl[0], rr[0])
            t_ext = cat(typ, rl[1], rr[1])
            g_ext = cat(tag, rl[2], rr[2])
            q_ext = cat(q, rl[3], rr[3]) if has_q else None
            m_ext = cat(msk, ml, mr)
            tmap = tag_map(g_ext, m_ext)
            sp = (local_special(tmap, g_ext)
                  if self.stag is not None else None)
            ps = pseudo_state(box, x_ext, t_ext, m_ext, q_ext)
            nl = nbr.build(ps, p, special=sp)
            overflow = overflow | nl.overflow
            topo = Topology(
                bonds=local_topo(tmap, self.bonds_j),
                angles=local_topo(tmap, self.angles_j),
                dihedrals=local_topo(tmap, self.dihedrals_j),
                impropers=local_topo(tmap, self.impropers_j))
            if vflag:
                topo_c = Topology(
                    bonds=local_topo(tmap, self.bonds_j, canon=True),
                    angles=local_topo(tmap, self.angles_j, canon=True),
                    dihedrals=local_topo(tmap, self.dihedrals_j,
                                         canon=True),
                    impropers=local_topo(tmap, self.impropers_j,
                                         canon=True))
            else:
                topo_c = topo
            cl = local_shake(tmap) if has_shake else ()
            core2 = {"x": x, "v": v, "t": typ, "g": tag, "m": msk,
                     "t_ext": t_ext,
                     "sidx_l": sidx_l, "sidx_r": sidx_r,
                     "shl": shl, "shr": shr}
            if has_q:
                core2["q"] = q
            sp_tree = ((sp.idx, sp.cls) if sp is not None else ())
            return lead((core2, nl, topo, topo_c, sp_tree, cl, overflow))

        def force_sm(core, box, nl, topo, topo_c, sp_tree):
            core, nl, topo, topo_c, sp_tree = unlead(
                (core, nl, topo, topo_c, sp_tree))
            x, typ, tag, msk = core["x"], core["t"], core["g"], core["m"]
            q = core["q"] if has_q else None
            arrays = [x, typ, tag] + ([q] if has_q else [])
            rl, rr = exchange(arrays, core["sidx_l"], core["sidx_r"],
                              core["shl"], core["shr"])
            ml, mr = ghost_mask(core["sidx_l"], core["sidx_r"])
            cat = lambda a, b, c: jnp.concatenate([a, b, c], axis=0)
            x_ext = cat(x, rl[0], rr[0])
            t_ext = cat(typ, rl[1], rr[1])
            q_ext = cat(q, rl[3], rr[3]) if has_q else None
            m_ext = cat(msk, ml, mr)
            ps = pseudo_state(box, x_ext, t_ext, m_ext, q_ext)
            nl = nl.replace(xhold=x_ext) if hasattr(nl, "replace") else nl
            slj = scoul = None
            if sp_w is not None:
                slj, scoul, _ = sp_w
            virial = jnp.zeros(6, dtype=x.dtype)
            try:
                f_ext, _, vir = ff.pair.compute(ps, nl, False, vflag,
                                                special_lj=slj,
                                                special_coul=scoul)
            except TypeError:
                f_ext, _, vir = ff.pair.compute(ps, nl, False, vflag)
            if vflag and vir is not None:
                virial = virial + vir
            for style, fn in ((ff.bond, bonded_mod.compute_bonds),
                              (ff.angle, bonded_mod.compute_angles)):
                if style is not None:
                    out = fn(style, ps, topo, False, False)
                    if out is not None:
                        f_ext = f_ext + out[0]
                    if vflag:
                        outc = fn(style, ps, topo_c, False, True)
                        if outc is not None and outc[2] is not None:
                            virial = virial + outc[2]
            for style, which in ((ff.dihedral, "dihedrals"),
                                 (ff.improper, "impropers")):
                if style is not None:
                    out = bonded_mod.compute_dihedrals(
                        style, ps, topo, False, False, which=which)
                    if out is not None:
                        f_ext = f_ext + out[0]
                    if vflag:
                        outc = bonded_mod.compute_dihedrals(
                            style, ps, topo_c, False, True, which=which)
                        if outc is not None and outc[2] is not None:
                            virial = virial + outc[2]
                        if (outc is not None and outc[3] is not None
                                and outc[3][1] is not None):
                            # CHARMM 1-4 pair virial (ref:
                            # dihedral_charmm.cpp:281 pair ev_tally)
                            virial = virial + outc[3][1]
            return lead((f_ext[:capS], virial))

        def shake_project_sm(core, box, cl):
            """Coordinate projection onto the constraint manifold (ref:
            FixShake::correct_coordinates, fix_shake.cpp:3243-3265, run at
            every Verlet::setup): solve with xshake = x and apply the
            dtfsq-free correction (1/m) sign lamda r to OWNED rows."""
            core, cl = unlead((core, cl))
            rows, ncc = cl
            x, typ, msk = core["x"], core["t"], core["m"]
            arrays = [x]
            rl, rr = exchange(arrays, core["sidx_l"], core["sidx_r"],
                              core["shl"], core["shr"])
            x_ext = jnp.concatenate([x, rl[0], rr[0]], axis=0)
            ml, mr = ghost_mask(core["sidx_l"], core["sidx_r"])
            m_ext = jnp.concatenate([msk, ml, mr], axis=0)
            ps = pseudo_state(box, x_ext, core["t_ext"], m_ext, None)
            fsh = dataclasses.replace(shake, atoms=rows, nc=ncc)
            df, im = fsh._solve(ps, x_ext, x_ext)
            corr = df * im[..., None]
            add = jnp.zeros_like(x_ext).at[rows.reshape(-1)].add(
                corr.reshape(-1, 3).astype(x.dtype), mode="drop")
            return lead(x + add[:capS])

        def shake_sm(core, box, f, cl):
            """SHAKE constraint force (ref: FixShake::post_force): ship
            authoritative (x, v, f) ghosts, solve every locally-resolved
            cluster, add df/dtfsq to OWNED rows. `dtfsq_fac` scales the
            prediction horizon (1.0 in-run, 0.5 at setup)."""
            core, f, cl = unlead((core, f, cl))
            rows, nc = cl
            x, v, msk = core["x"], core["v"], core["m"]
            arrays = [x, v, f]
            rl, rr = exchange(arrays, core["sidx_l"], core["sidx_r"],
                              core["shl"], core["shr"])
            cat = lambda a, b, c: jnp.concatenate([a, b, c], axis=0)
            x_ext = cat(x, rl[0], rr[0])
            v_ext = cat(v, rl[1], rr[1])
            f_ext = cat(f, rl[2], rr[2])
            ml, mr = ghost_mask(core["sidx_l"], core["sidx_r"])
            m_ext = cat(msk, ml, mr)
            t_ext = core["t_ext"]
            ps = pseudo_state(box, x_ext, t_ext, m_ext, None)
            ps = ps.replace(v=v_ext, f=f_ext)
            fsh = dataclasses.replace(shake, atoms=rows, nc=nc)
            dtfsq = fsh.dtfsq * self._shake_fac
            invm = 1.0 / ps.per_atom_mass
            xs = (x_ext + fsh.dtv * v_ext
                  + (dtfsq * invm)[:, None] * f_ext)
            df, _ = fsh._solve(ps, x_ext, xs)
            add = jnp.zeros_like(x_ext).at[rows.reshape(-1)].add(
                (df / dtfsq).reshape(-1, 3).astype(x.dtype), mode="drop")
            return lead(f + add[:capS])

        # pytree-prefix specs: core/nl/topo leaves are per-shard with a
        # leading axis; the box is replicated (P())
        self._rebuild_sm = shard_map(
            rebuild_sm, mesh=mesh, in_specs=(P("x"), P()),
            out_specs=P("x"))
        self._force_sm = shard_map(
            force_sm, mesh=mesh,
            in_specs=(P("x"), P(), P("x"), P("x"), P("x"), P("x")),
            out_specs=P("x"))
        if has_shake:
            self._shake_fac = 1.0
            self._shake_sm = shard_map(
                shake_sm, mesh=mesh,
                in_specs=(P("x"), P(), P("x"), P("x")),
                out_specs=P("x"))
            self._shake_project_sm = shard_map(
                shake_project_sm, mesh=mesh,
                in_specs=(P("x"), P(), P("x")),
                out_specs=P("x"))

    # -- GSPMD-level helpers ---------------------------------------------------

    def _shake_apply(self, core, box, f, cl, fac: float):
        """Apply the SHAKE constraint force with prediction scale `fac`
        (1.0 = post_force, 0.5 = the setup half-kick,
        ref: fix_shake.cpp:465-512)."""
        if self.shake_tags is None:
            return f
        self._shake_fac = fac
        # shard fns close over _shake_fac via attribute read at trace time
        return self._shake_sm(core, box, f, cl)

    def _global_view(self, core, box, f, virial, aux, ntimestep):
        """A State over the FLAT sharded arrays: the Nose-Hoover hooks
        (integrate/nh.py) run on it unmodified — reductions become psums,
        per-atom updates stay sharded elementwise ops."""
        nd, capS = self.ndev, self.capS
        flat = lambda a: a.reshape((nd * capS,) + a.shape[2:])
        return State(
            x=flat(core["x"]), v=flat(core["v"]), f=flat(f),
            type=flat(core["t"]), tag=flat(core["g"]),
            image=jnp.zeros((nd * capS, 3), dtype=jnp.int32),
            q=flat(core["q"]) if self.qs is not None else None,
            molecule=None, box=box, mass=self.mass,
            nlocal=jnp.asarray(self.natoms_global, jnp.int32),
            mask=flat(core["m"]), virial=virial,
            ntimestep=ntimestep, aux=aux,
            units_name=self.global_state.units_name,
            dimension=self.global_state.dimension,
            owned_all=True)

    def _core_from_view(self, core, gv):
        nd, capS = self.ndev, self.capS
        unflat = lambda a: a.reshape((nd, capS) + a.shape[1:])
        return {**core, "x": unflat(gv.x), "v": unflat(gv.v)}

    def _total_force(self, core, box, nl, topo, topo_c, sp_tree):
        f, vir_sr = self._force_sm(core, box, nl, topo, topo_c, sp_tree)
        virial = jnp.sum(vir_sr, axis=0)
        kspace = self.ff.kspace
        if kspace is None:
            return f, virial
        nd, capS = self.ndev, self.capS
        st = self.global_state
        msk = core["m"]
        xg = core["x"].reshape(nd * capS, 3)
        qg = jnp.where(msk != 0, core["q"], 0.0).reshape(nd * capS)
        ps = st.replace(
            x=xg, v=jnp.zeros_like(xg), f=jnp.zeros_like(xg),
            q=qg, type=jnp.ones(nd * capS, jnp.int32),
            tag=jnp.zeros(nd * capS, jnp.int32),
            image=jnp.zeros((nd * capS, 3), jnp.int32),
            mask=msk.reshape(nd * capS), box=box,
            nlocal=jnp.asarray(nd * capS, jnp.int32),
            virial=jnp.zeros(6, xg.dtype), aux={})
        fk, _, virk = kspace.compute(ps, False, self._vflag)
        if self._vflag and virk is not None:
            virial = virial + virk
        return f + fk.reshape(nd, capS, 3), virial

    # -- run ------------------------------------------------------------------

    def _get_runner(self, ncycles: int, tail: int):
        key = (ncycles, tail, self.integrator is not None)
        fn = self._runner_cache.get(key)
        if fn is not None:
            return fn
        if not hasattr(self, "_rebuild_sm"):
            self._shard_fns()
        if self.integrator is not None:
            fn = self._build_nh_runner(ncycles, tail)
        else:
            fn = self._build_nve_runner(ncycles, tail)
        self._runner_cache[key] = fn
        return fn

    def _build_nve_runner(self, ncycles: int, tail: int):
        has_q = self.qs is not None
        mass = self.mass
        dtv = self.dt
        dtf = 0.5 * self.dt * self.units.ftm2v

        def inner(carry, _):
            core, box, nl, topo, topo_c, sp_tree, cl, f, ovf = carry
            gm = (core["m"] != 0)[..., None]
            minv = 1.0 / mass[core["t"]][..., None]
            v = core["v"] + jnp.where(gm, dtf * f * minv, 0.0)
            x = core["x"] + jnp.where(gm, dtv * v, 0.0)
            core = {**core, "x": x, "v": v}
            f, _ = self._total_force(core, box, nl, topo, topo_c, sp_tree)
            if self.shake_tags is not None:
                f = self._shake_apply(core, box, f, cl, 1.0)
            v = core["v"] + jnp.where(gm, dtf * f * minv, 0.0)
            core = {**core, "v": v}
            return (core, box, nl, topo, topo_c, sp_tree, cl, f, ovf), None

        def do_rebuild(core, box, ovf):
            core2, nl, topo, topo_c, sp_tree, cl, ov = self._rebuild_sm(
                core, box)
            return core2, nl, topo, topo_c, sp_tree, cl, ovf | jnp.any(ov)

        def cycle(carry, _):
            carry, _ = jax.lax.scan(inner, carry, None,
                                    length=self.rebuild_every)
            core, box, nl, topo, topo_c, sp_tree, cl, f, ovf = carry
            core, nl, topo, topo_c, sp_tree, cl, ovf = do_rebuild(
                core, box, ovf)
            f, _ = self._total_force(core, box, nl, topo, topo_c, sp_tree)
            if self.shake_tags is not None:
                f = self._shake_apply(core, box, f, cl, 1.0)
            return (core, box, nl, topo, topo_c, sp_tree, cl, f, ovf), None

        def runner(core, box):
            core, nl, topo, topo_c, sp_tree, cl, ovf = do_rebuild(
                core, box, jnp.asarray(False))
            if self.shake_tags is not None:
                core = {**core,
                        "x": self._shake_project_sm(core, box, cl)}
            f, _ = self._total_force(core, box, nl, topo, topo_c, sp_tree)
            if self.shake_tags is not None:
                f = self._shake_apply(core, box, f, cl, 0.5)
            carry = (core, box, nl, topo, topo_c, sp_tree, cl, f, ovf)
            carry, _ = jax.lax.scan(cycle, carry, None, length=ncycles)
            carry, _ = jax.lax.scan(inner, carry, None, length=tail)
            return carry

        return jax.jit(runner)

    def _build_nh_runner(self, ncycles: int, tail: int):
        """Nose-Hoover (NVT/NPT/NPH) runner following the single-chip step
        ordering exactly (integrate/verlet.py make_step): initial_integrate
        -> [rebuild on cadence] -> force(+virial) -> SHAKE post_force ->
        final_integrate. The rebuild step lives INSIDE the step (between
        kick-drift and force), as in Verlet::run (src/verlet.cpp:262-293),
        so SHAKE's velocity-dependent prediction sees the mid-step v."""
        integ = self.integrator
        R = self.rebuild_every

        def do_rebuild(core, box, ovf):
            core2, nl, topo, topo_c, sp_tree, cl, ov = self._rebuild_sm(
                core, box)
            return core2, nl, topo, topo_c, sp_tree, cl, ovf | jnp.any(ov)

        def make_inner(rebuild: bool):
            def inner(carry, _):
                (core, box, nl, topo, topo_c, sp_tree, cl, f, virial,
                 aux, ts, ovf) = carry
                ts = ts + 1
                gv = self._global_view(core, box, f, virial, aux, ts)
                gv = integ.initial_integrate(gv)
                core = self._core_from_view(core, gv)
                box, aux = gv.box, gv.aux
                if rebuild:
                    core, nl, topo, topo_c, sp_tree, cl, ovf = do_rebuild(
                        core, box, ovf)
                f, virial = self._total_force(core, box, nl, topo, topo_c,
                                              sp_tree)
                if self.shake_tags is not None:
                    f = self._shake_apply(core, box, f, cl, 1.0)
                gv = self._global_view(core, box, f, virial, aux, ts)
                gv = integ.final_integrate(gv)
                gv = integ.end_of_step(gv)
                core = {**core, "v": gv.v.reshape(core["v"].shape)}
                aux = gv.aux
                return (core, box, nl, topo, topo_c, sp_tree, cl, f,
                        virial, aux, ts, ovf), None
            return inner

        inner = make_inner(False)
        inner_rb = make_inner(True)

        def cycle(carry, _):
            carry, _ = jax.lax.scan(inner, carry, None, length=R - 1)
            carry, _ = inner_rb(carry, None)
            return carry, None

        def runner(core, box, aux, ts):
            core, nl, topo, topo_c, sp_tree, cl, ovf = do_rebuild(
                core, box, jnp.asarray(False))
            if self.shake_tags is not None:
                core = {**core,
                        "x": self._shake_project_sm(core, box, cl)}
            f, virial = self._total_force(core, box, nl, topo, topo_c,
                                          sp_tree)
            if self.shake_tags is not None:
                f = self._shake_apply(core, box, f, cl, 0.5)
            carry = (core, box, nl, topo, topo_c, sp_tree, cl, f, virial,
                     aux, ts, ovf)
            carry, _ = jax.lax.scan(cycle, carry, None, length=ncycles)
            carry, _ = jax.lax.scan(inner, carry, None, length=tail)
            return carry

        return jax.jit(runner)

    def run(self, nsteps: int):
        if not hasattr(self, "_rebuild_sm"):
            self._shard_fns()
        R = self.rebuild_every
        ncycles, tail = divmod(nsteps, R)
        core = {"x": self.xs, "v": self.vs, "t": self.ts, "g": self.tg,
                "m": self.ms,
                "t_ext": jnp.zeros((self.ndev, self.capS + 2 * self.G),
                                   jnp.int32),
                "sidx_l": jnp.zeros((self.ndev, self.G), jnp.int32),
                "sidx_r": jnp.zeros((self.ndev, self.G), jnp.int32),
                "shl": jnp.zeros((self.ndev,),
                                 np.dtype(self.global_state.dtype)),
                "shr": jnp.zeros((self.ndev,),
                                 np.dtype(self.global_state.dtype))}
        if self.qs is not None:
            core["q"] = self.qs

        if self.integrator is None:
            runner = self._get_runner(ncycles, tail)
            out = runner(core, self.box)
            (out_core, box, nl, topo, topo_c, sp_tree, cl, f, ovf) = out
            self._unpack(out_core, box, f, ovf)
            return

        # Nose-Hoover path: install the run window + per-segment refresh
        # on a host-side global view (ref: runner.py run() nh_run block)
        ts0 = self._ntimestep
        dt_np = np.dtype(self.global_state.dtype)
        zf = jnp.zeros((self.ndev, self.capS, 3), dtype=dt_np)
        zv = jnp.zeros(6, dtype=dt_np)
        aux0 = dict(self._nh_aux) if self._nh_aux is not None else {}
        aux0["nh_run"] = jnp.asarray([ts0, ts0 + nsteps], jnp.int32)
        gv0 = self._global_view(core, self.box, zf, zv, aux0,
                                jnp.asarray(ts0, jnp.int32))
        if self._nh_aux is None or "nh" not in self._nh_aux:
            gv0 = self.integrator.setup(gv0)
        else:
            gv0 = self.integrator.refresh_segment(gv0)
        aux = gv0.aux

        runner = self._get_runner(ncycles, tail)
        out = runner(core, self.box, aux, jnp.asarray(ts0, jnp.int32))
        (out_core, box, nl, topo, topo_c, sp_tree, cl, f, virial,
         aux, ts, ovf) = out
        self._nh_aux = aux
        self._ntimestep = ts0 + nsteps
        self._unpack(out_core, box, f, ovf)

    def _unpack(self, out_core, box, f, ovf):
        self.overflow = bool(jax.device_get(jnp.any(ovf)))
        if self.overflow:
            raise RuntimeError(
                "sharded molecular capacity overflow (grow caps/ghosts)")
        self.xs, self.vs = out_core["x"], out_core["v"]
        self.ts, self.tg, self.ms = (out_core["t"], out_core["g"],
                                     out_core["m"])
        self.box = box
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
               "v": flat(self.vs)[order], "type": flat(self.ts)[order],
               "box": jax.device_get(self.box)}
        if self.qs is not None:
            out["q"] = flat(self.qs)[order]
        return out
