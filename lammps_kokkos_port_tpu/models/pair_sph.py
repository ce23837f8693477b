"""SPH pair styles: sph/rhosum, sph/taitwater, sph/taitwater/morris.

TPU-native re-design of the fork's defining delta — the hand-ported Kokkos
SPH styles (ref: src/KOKKOS/pair_sph_rhosum_kokkos.cpp,
pair_sph_taitwater_morris_kokkos.cpp marked "Moein"; CPU originals
src/SPH/pair_sph_rhosum.cpp, pair_sph_taitwater.cpp,
pair_sph_taitwater_morris.cpp, SURVEY.md §2.11).

Design: SUMMATION density. The canonical decks run
`pair_style hybrid/overlay sph/rhosum 1 sph/taitwater` — density
re-summed every step (ref: examples/PACKAGES/sph/water_collapse). Here
that composition is one fused style: every force evaluation recomputes
rho_i = m_i W(0) + sum_j m_j W(r_ij) over the same full list (the
EAM-style two-pass pattern, no mid-step communication), then applies the
Tait-EOS pressure force with Morris laminar viscosity (morris=True,
ref: pair_sph_taitwater_morris.cpp:98-210) or Monaghan artificial
viscosity (morris=False, ref: pair_sph_taitwater.cpp "Monaghan 1992").
The continuity-equation mode (fix sph integrating drho) is subsumed: with
per-step re-summation the density needs no time integration, so `fix sph`
reduces to group-scoped velocity-Verlet.

Kernels are the reference's quadric (density) and Lucy-derivative
(force) forms with identical normalization constants.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pair import gather_pairs, tally_virial

Array = jax.Array

# quadric kernel normalizations (ref: pair_sph_rhosum.cpp)
_QUADRIC_3D = 2.1541870227086614782
_QUADRIC_2D = 1.5915494309189533576
# Lucy kernel derivative normalizations (ref: pair_sph_taitwater.cpp)
_LUCY_D_3D = 25.066903536973515383
_LUCY_D_2D = 19.098593171027440292


def _wf_quadric(r2, h, dim: int):
    """Quadric kernel value (includes the r=0 self weight at r2=0)."""
    ih = 1.0 / h
    wf = 1.0 - r2 * ih * ih
    wf = jnp.maximum(wf, 0.0)
    wf = wf * wf
    wf = wf * wf
    if dim == 3:
        return _QUADRIC_3D * wf * ih * ih * ih
    return _QUADRIC_2D * wf * ih * ih


def _wfd_lucy(r2, h, dim: int):
    """Lucy kernel derivative / r (ref comment: 'lacking a factor of r')."""
    ih = 1.0 / h
    ihsq = ih * ih
    wfd = h - jnp.sqrt(r2)
    if dim == 3:
        return -_LUCY_D_3D * wfd * wfd * ihsq * ihsq * ihsq * ih
    return -_LUCY_D_2D * wfd * wfd * ihsq * ihsq * ihsq


_SPH_FIELDS = ["rho0", "bmod", "soundspeed", "viscosity", "cut", "rho_cut"]
_SPH_META = ["ntypes", "morris", "dimension"]


@partial(jax.tree_util.register_dataclass,
         data_fields=_SPH_FIELDS, meta_fields=_SPH_META)
@dataclasses.dataclass(frozen=True)
class PairSPHTaitwater:
    """Tait-EOS SPH water with summation density.

    B = c0^2 rho0 / 7 per type (ref: pair_sph_taitwater.cpp coeff).
    """

    rho0: Array  # [nt+1]
    bmod: Array  # [nt+1] Tait bulk modulus B
    soundspeed: Array  # [nt+1]
    viscosity: Array  # [nt+1, nt+1]
    cut: Array  # [nt+1, nt+1] force kernel h
    rho_cut: Array  # [nt+1, nt+1] density kernel h
    ntypes: int
    morris: bool
    dimension: int

    def cutsq_table(self) -> Array:
        c = jnp.maximum(self.cut, self.rho_cut)
        return c * c

    def max_cutoff(self) -> float:
        return float(np.asarray(jax.device_get(
            jnp.max(jnp.maximum(self.cut, self.rho_cut)))))

    def rho(self, state, nl) -> Array:
        """Summation density [cap] (ref: PairSPHRhoSum::compute)."""
        j, jc, pair_valid, dx, r2 = gather_pairs(state, nl)
        dim = self.dimension
        ti = state.type
        tj = state.type[jc]
        m = state.per_atom_mass
        h_self = self.rho_cut[ti, ti]
        wf0 = _wf_quadric(jnp.zeros_like(h_self), h_self, dim)
        hij = self.rho_cut[ti[:, None], tj]
        within = pair_valid & (r2 < hij * hij)
        wf = jnp.where(within, _wf_quadric(r2, hij, dim), 0.0)
        rho = m * wf0 + jnp.sum(m[jc] * wf, axis=1)
        return jnp.where(state.valid_mask, rho, 1.0)

    def compute(self, state, nl, eflag: bool, vflag: bool,
                special_lj=None, special_coul=None):
        dt = state.dtype
        dim = self.dimension
        j, jc, pair_valid, dx, r2 = gather_pairs(state, nl)
        rho = self.rho(state, nl)

        ti = state.type
        tj_pair = state.type[jc]
        m = state.per_atom_mass
        # Tait pressure term f_i = B_i ((rho_i/rho0_i)^7 - 1) / rho_i^2
        tmp = rho / self.rho0[ti]
        t3 = tmp * tmp * tmp
        fpress = self.bmod[ti] * (t3 * t3 * tmp - 1.0) / (rho * rho)

        hij = self.cut[ti[:, None], tj_pair]
        within = pair_valid & (r2 < hij * hij)
        r2s = jnp.where(within, r2, jnp.ones((), dt))
        wfd = jnp.where(within, _wfd_lucy(r2s, hij, dim), 0.0)

        # velocity-dependent terms use the EXTRAPOLATED full-step
        # velocities vest = v(t) + 2*dtf/m*f(t), maintained by fix sph
        # (ref: pair_sph_taitwater.cpp:70 `v = atom->vest`,
        # fix_sph.cpp initial_integrate extrapolation)
        vel = state.aux.get("vest", state.v)
        vi = vel[:, None, :]
        vj = vel[jc]
        dv = vi - vj
        dvdotdr = jnp.sum(dv * dx, axis=-1)

        mi = m[:, None]
        mj = m[jc]
        fi = fpress[:, None]
        fj = fpress[jc]
        rho_i = rho[:, None]
        rho_j = rho[jc]

        if self.morris:
            # Morris (1996) laminar viscosity
            # (ref: pair_sph_taitwater_morris.cpp:165-180)
            visc = self.viscosity[ti[:, None], tj_pair]
            fvisc = 2.0 * visc / (rho_i * rho_j) * mi * mj * wfd
            fpair = -mi * mj * (fi + fj) * wfd
            fvec = dx * fpair[..., None] + dv * fvisc[..., None]
        else:
            # Monaghan (1992) artificial viscosity
            # (ref: pair_sph_taitwater.cpp:150-162)
            mu = hij * dvdotdr / (r2s + 0.01 * hij * hij)
            ci = self.soundspeed[ti][:, None]
            cj = self.soundspeed[tj_pair]
            visc = self.viscosity[ti[:, None], tj_pair]
            fvisc = jnp.where(
                dvdotdr < 0.0,
                -visc * (ci + cj) * mu / (rho_i + rho_j),
                0.0,
            )
            fpair = -mi * mj * (fi + fj + fvisc) * wfd
            fvec = dx * fpair[..., None]

        fvec = jnp.where(within[..., None], fvec, 0.0)
        f = jnp.sum(fvec, axis=1)

        pe = jnp.zeros((), dt) if eflag else None  # SPH has no pair PE
        virial = None
        if vflag:
            owned = state.owned_mask[:, None]
            w = jnp.where(within & owned, fpair, 0.0)
            virial = tally_virial(w, dx)
        return f, pe, virial


@partial(jax.tree_util.register_dataclass,
         data_fields=["rho_cut"], meta_fields=["ntypes", "dimension"])
@dataclasses.dataclass(frozen=True)
class PairSPHRhoSum:
    """Standalone density summation (zero forces) — the overlay component
    (ref: src/SPH/pair_sph_rhosum.cpp; Kokkos port
    src/KOKKOS/pair_sph_rhosum_kokkos.cpp)."""

    rho_cut: Array  # [nt+1, nt+1]
    ntypes: int
    dimension: int

    def cutsq_table(self) -> Array:
        return self.rho_cut * self.rho_cut

    def max_cutoff(self) -> float:
        return float(np.asarray(jax.device_get(jnp.max(self.rho_cut))))

    def rho(self, state, nl) -> Array:
        helper = PairSPHTaitwater(
            rho0=jnp.ones(self.ntypes + 1), bmod=jnp.ones(self.ntypes + 1),
            soundspeed=jnp.ones(self.ntypes + 1),
            viscosity=jnp.ones((self.ntypes + 1,) * 2),
            cut=self.rho_cut, rho_cut=self.rho_cut,
            ntypes=self.ntypes, morris=False, dimension=self.dimension,
        )
        return helper.rho(state, nl)

    def compute(self, state, nl, eflag: bool, vflag: bool,
                special_lj=None, special_coul=None):
        z = jnp.zeros((), state.dtype)
        return (jnp.zeros_like(state.x), z if eflag else None,
                jnp.zeros(6, state.dtype) if vflag else None)


def _table(ntypes, fill=0.0):
    return np.full((ntypes + 1, ntypes + 1), fill)


def make_sph_taitwater(ntypes: int, coeffs: dict, morris: bool = False,
                       rho_cut: dict | None = None, dimension: int = 3,
                       dtype=jnp.float64) -> PairSPHTaitwater:
    """coeffs[(i,j)] = (rho0, soundspeed, viscosity, cut)
    (ref: PairSPHTaitwater[Morris]::coeff — B = c^2 rho0/7; rho0/c are
    PER-TYPE, set from the i of each row). rho_cut: optional per-pair
    density-kernel h (the sph/rhosum overlay's coeff); defaults to cut."""
    rho0 = np.zeros(ntypes + 1)
    c0 = np.zeros(ntypes + 1)
    bmod = np.zeros(ntypes + 1)
    visc = _table(ntypes)
    cut = _table(ntypes)
    for (i, jt), c in coeffs.items():
        lo, hi = min(i, jt), max(i, jt)
        rho0[lo] = c[0]
        c0[lo] = c[1]
        bmod[lo] = c[1] * c[1] * c[0] / 7.0
        if lo == hi:
            rho0[hi] = c[0]
            c0[hi] = c[1]
            bmod[hi] = c[1] * c[1] * c[0] / 7.0
        visc[lo, hi] = visc[hi, lo] = c[2]
        cut[lo, hi] = cut[hi, lo] = c[3]
    rc = cut.copy()
    if rho_cut:
        for (i, jt), h in rho_cut.items():
            lo, hi = min(i, jt), max(i, jt)
            rc[lo, hi] = rc[hi, lo] = float(h)
    asx = lambda a: jnp.asarray(a, dtype=dtype)
    return PairSPHTaitwater(
        rho0=asx(rho0), bmod=asx(bmod), soundspeed=asx(c0),
        viscosity=asx(visc), cut=asx(cut), rho_cut=asx(rc),
        ntypes=ntypes, morris=morris, dimension=dimension,
    )


def make_sph_rhosum(ntypes: int, coeffs: dict, dimension: int = 3,
                    dtype=jnp.float64) -> PairSPHRhoSum:
    """coeffs[(i,j)] = (h,)"""
    rc = _table(ntypes)
    for (i, jt), c in coeffs.items():
        lo, hi = min(i, jt), max(i, jt)
        h = c[0] if isinstance(c, (tuple, list)) else c
        rc[lo, hi] = rc[hi, lo] = float(h)
    return PairSPHRhoSum(rho_cut=jnp.asarray(rc, dtype=dtype),
                         ntypes=ntypes, dimension=dimension)
