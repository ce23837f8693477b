"""pair gran/hooke[/history]: Hookean granular contact mechanics.

TPU-native equivalent of src/GRANULAR/pair_gran_hooke_history.cpp. Contacts
are Hookean springs with normal velocity damping, tangential shear-history
friction (Coulomb-limited), and torque on both particles.

The shear history is the stateful part: the reference stores a per-contact
3-vector on the HALF neighbor list, advanced in place during every force
pass (shear += vtr*dt, projected normal to the contact, rescaled at the
Coulomb limit). Here the full-matrix analog keeps a [cap, K, 3] array in
``state.aux["gran_shear"]`` aligned with the neighbor-matrix slots; each
DIRECTED edge carries its own copy, and because vtr(i,j) = -vtr(j,i) the
two copies stay exactly antisymmetric — summing only i-side force/torque
per directed edge reproduces the half-list i+j tally. On neighbor rebuild
the array is carried over by matching partner row indices (the analog of
FixNeighHistory's tag-matched copy, src/fix_neigh_history.cpp pre_exchange).

The whole update is one fused functional pass: ``compute_gran`` returns
(f, torque, new_shear) and the Verlet step writes the latter two into aux
(shearupdate=False during run setup, ref: compute `if update->setupflag`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .pair import gather_pairs

Array = jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[],
    meta_fields=["kn", "kt", "gamman", "gammat", "xmu", "dt",
                 "freeze_groupbit", "max_radius", "history", "ntypes"],
)
@dataclasses.dataclass(frozen=True)
class PairGranHooke:
    """pair_style gran/hooke[/history] kn kt gamma_n gamma_t xmu dampflag
    (ref: PairGranHookeHistory::settings — NULL kt -> 2/7 kn, NULL
    gammat -> gamman/2, dampflag 0 -> gammat = 0)."""

    kn: float
    kt: float
    gamman: float
    gammat: float
    xmu: float
    dt: float
    freeze_groupbit: int = 0
    max_radius: float = 0.5
    history: bool = True

    ntypes: int = 1
    has_torque = True
    is_granular = True

    def max_cutoff(self) -> float:
        # contact range: radius_i + radius_j (init_one: cutoff = radsum)
        return 2.0 * self.max_radius

    def cutsq_table(self):
        c = self.max_cutoff()
        return jnp.full((2, 2), c * c)

    def compute_gran(self, state, nl, shear: Array, shearupdate: bool):
        """One granular force pass. Returns (f [cap,3], torque [cap,3],
        new_shear). Dense GridCells lists take the gather-free grid
        engine (ops/grangrid, the TPU fast path); matrix lists the
        [cap, K, 3] slot-space below."""
        from ..ops import grangrid, gridforce

        if isinstance(nl, gridforce.GridCells):
            return grangrid.compute_gran_grid(self, state, nl, shear,
                                              shearupdate)
        j, jc, pair_valid, dx, r2 = gather_pairs(state, nl)
        rad = state.aux["radius"]
        radi = rad[:, None]
        radj = rad[jc]
        radsum = radi + radj
        touching = pair_valid & (r2 < radsum * radsum) & (r2 > 0.0)

        r2s = jnp.where(touching, r2, 1.0)
        rinv = 1.0 / jnp.sqrt(r2s)
        r = r2s * rinv
        rsqinv = 1.0 / r2s

        v = state.v
        om = state.aux["omega"]
        vr = v[:, None, :] - v[jc]
        vnnr = jnp.sum(vr * dx, axis=-1)
        vn = dx * (vnnr * rsqinv)[..., None]
        vt = vr - vn

        # relative surface velocity from rotation:
        # vtr = vt - (del x wr) with the reference's component order
        # (vtr1 = vt1 - (delz*wr2 - dely*wr3) = vt + cross(del, wr))
        w = (radi[..., None] * om[:, None, :] + radj[..., None] * om[jc]) \
            * rinv[..., None]
        vtr = vt + jnp.cross(dx, w)

        m = state.per_atom_mass
        mi = m[:, None]
        mj = m[jc]
        meff = mi * mj / (mi + mj)
        if self.freeze_groupbit:
            fz = (state.mask & jnp.int32(self.freeze_groupbit)) != 0
            fzi = jnp.broadcast_to(fz[:, None], meff.shape)
            fzj = fz[jc]
            # reference order: i-frozen sets mj, then j-frozen overrides
            meff = jnp.where(fzi, mj, meff)
            meff = jnp.where(fzj, mi, meff)

        damp = meff * self.gamman * vnnr * rsqinv
        ccel = self.kn * (radsum - r) * rinv - damp

        if self.history:
            if shearupdate:
                sh = shear + vtr * self.dt
            else:
                sh = shear
            shrmag = jnp.sqrt(jnp.sum(sh * sh, axis=-1))
            if shearupdate:
                rsht = jnp.sum(sh * dx, axis=-1) * rsqinv
                sh = sh - rsht[..., None] * dx
            fs_v = -(self.kt * sh + (meff * self.gammat)[..., None] * vtr)
            fs = jnp.sqrt(jnp.sum(fs_v * fs_v, axis=-1))
            fn = self.xmu * jnp.abs(ccel * r)
            over = fs > fn
            ratio = fn / jnp.where(fs > 0.0, fs, 1.0)
            gv = (meff * self.gammat)[..., None] * vtr / self.kt
            sh_rescaled = jnp.where(
                (over & (shrmag > 0.0))[..., None],
                ratio[..., None] * (sh + gv) - gv, sh)
            fs_v = jnp.where(over[..., None],
                             jnp.where((shrmag > 0.0)[..., None],
                                       fs_v * ratio[..., None], 0.0),
                             fs_v)
            sh = sh_rescaled
            new_shear = jnp.where(touching[..., None], sh, 0.0)
        else:
            # gran/hooke (no history): force capped at the Coulomb limit
            # (ref: pair_gran_hooke.cpp: ft = MIN(fn, fs)/vrel, f -= ft*vtr)
            vrel = jnp.sqrt(jnp.sum(vtr * vtr, axis=-1))
            fn = self.xmu * jnp.abs(ccel * r)
            fsd = meff * self.gammat * vrel
            ft = jnp.where(vrel != 0.0,
                           jnp.minimum(fn, fsd) / jnp.where(vrel != 0.0,
                                                            vrel, 1.0),
                           0.0)
            fs_v = -ft[..., None] * vtr
            new_shear = shear

        fe = dx * ccel[..., None] + fs_v
        fe = jnp.where(touching[..., None], fe, 0.0)
        f = jnp.sum(fe, axis=1)

        tor = jnp.cross(dx, fs_v) * rinv[..., None]
        tor = jnp.where(touching[..., None], tor, 0.0)
        torque = -jnp.sum(radi[..., None] * tor, axis=1)
        return f, torque, new_shear

    def compute(self, state, nl, eflag: bool, vflag: bool,
                special_lj=None, special_coul=None):
        """Pair-protocol compatibility: force only (granular has no pair
        energy; virial from del x F if requested)."""
        shear = state.aux.get("gran_shear")
        if shear is None:
            shear = jnp.zeros(nl.idx.shape + (3,), dtype=state.dtype)
        f, _, _ = self.compute_gran(state, nl, shear, False)
        pe = jnp.zeros((), state.dtype) if eflag else None
        virial = jnp.zeros(6, state.dtype) if vflag else None
        return f, pe, virial


def remap_shear(shear: Array, old_idx: Array, new_idx: Array) -> Array:
    """Carry per-slot shear across a neighbor rebuild by matching partner
    row indices (rows are stable in matrix mode). New slots with no prior
    contact start at zero (FixNeighHistory semantics)."""
    cap = shear.shape[0]
    # match[i, knew, kold] — modest K*K blow-up, fused by XLA
    eq = new_idx[:, :, None] == old_idx[:, None, :]
    eq = eq & (new_idx[:, :, None] < cap)
    hit = jnp.any(eq, axis=-1)
    src = jnp.argmax(eq, axis=-1)
    carried = jnp.take_along_axis(shear, src[..., None], axis=1)
    return jnp.where(hit[..., None], carried, 0.0)
