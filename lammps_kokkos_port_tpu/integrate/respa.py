"""rRESPA multi-timescale integration (run_style respa).

TPU-native redesign of the reference's nested-loop integrator
(ref: src/respa.cpp Respa::recurse + fix_nve's *_respa hooks): force
categories (bond/angle/dihedral/improper/pair/kspace) are assigned to
levels; inner levels advance with smaller timesteps between outer-level
half kicks:

    level L:  v += dtf_L f_L/m
              repeat loop[L-1] x { level L-1 }     (innermost: drift x)
              f_L = F_L(x); v += dtf_L f_L/m

Instead of per-level force arrays held by a FixRespa (ref:
src/fix_respa.cpp), the per-level forces live in `state.aux["respa_f"]`
(a tuple of [cap,3] arrays) so the whole nested step is one pure traced
function; the Python recursion UNROLLS into a single fused XLA graph (the
inner loop count is a compile-time constant, matching the reference where
`loop[]` is fixed per run style).

Neighbor rebuild is decided once per outermost step before the outer
force evaluation (the reference checks `neighbor->decide()` where the
list consumers live — the pair level)."""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.state import State
from ..ops import neighbor as nbr
from .verlet import AuxFix, Integrator

Array = jax.Array

CATS = ("bond", "angle", "dihedral", "improper", "pair", "kspace")


@dataclasses.dataclass(frozen=True)
class RespaLevels:
    """Level assignment + loop factors (ref: Respa::Respa arg parsing,
    src/respa.cpp:40-200). loops[l] = iterations of level l per one
    iteration of level l+1 (len nlevels-1). level_of maps category ->
    0-based level; unassigned categories default to the outermost level
    (the reference defaults pair/kspace outer, bond inner)."""

    nlevels: int
    loops: tuple  # len nlevels-1
    level_of: tuple  # ((cat, level), ...)

    def cats_at(self, level: int) -> tuple:
        lo = dict(self.level_of)
        return tuple(c for c in CATS
                     if lo.get(c, self.nlevels - 1) == level)

    def dts(self, dt_outer: float) -> list:
        """Per-level timestep, innermost first."""
        dts = [dt_outer] * self.nlevels
        for l in range(self.nlevels - 2, -1, -1):
            dts[l] = dts[l + 1] / self.loops[l]
        return dts


def make_respa_step(
    integrator: Integrator,
    forcefield,
    levels: RespaLevels,
    fixes: Sequence[AuxFix] = (),
    special=None,
):
    """Build the jittable rRESPA step: step(state, nl) -> (state, nl).
    The [N,K] matrix neighbor path only (molecular systems)."""
    units = integrator.units
    dt_outer = integrator.dt
    dts = levels.dts(dt_outer)
    cats_by_level = [levels.cats_at(l) for l in range(levels.nlevels)]

    def level_force(state: State, nl, level: int) -> Array:
        cats = cats_by_level[level]
        if not cats:
            return jnp.zeros_like(state.x)
        f, _, _, _ = forcefield.compute_categories(state, nl, cats, False,
                                                   False)
        return f

    def kick(state: State, f: Array, dt_l: float) -> State:
        dtf = 0.5 * dt_l * units.ftm2v
        m = state.per_atom_mass[:, None]
        g = (state.valid_mask
             & state.group_mask(integrator.groupbit))[:, None]
        v = state.v + jnp.where(g, dtf * f / m, 0.0)
        return state.replace(v=v)

    def drift(state: State, dt_l: float) -> State:
        g = (state.valid_mask
             & state.group_mask(integrator.groupbit))[:, None]
        x = state.x + jnp.where(g, dt_l * state.v, 0.0)
        return state.replace(x=x)

    def do_rebuild(state, nl):
        x, image = state.box.wrap(state.x, state.image)
        state = state.replace(x=x, image=image)
        return state, nbr.rebuild_merge(state, nl, special=special)

    def no_rebuild(state, nl):
        return state, nbr.tick(nl)

    def recurse(state: State, nl, level: int):
        """One iteration of `level` (called loop[level] times by the
        parent). Returns (state, nl) with aux['respa_f'] updated."""
        fl = state.aux["respa_f"]
        state = kick(state, fl[level], dts[level])
        if level == 0:
            state = drift(state, dts[0])
            for fx in fixes:
                state = fx.post_integrate(state)
        else:
            for _ in range(levels.loops[level - 1]):
                state, nl = recurse(state, nl, level - 1)
        if level == levels.nlevels - 1:
            # neighbor decision after all drifts, before the outer (list-
            # consuming) force pass — matching Verlet's placement (ref:
            # Respa::recurse neighbor hooks; inner levels are bonded-only
            # and list-free)
            rebuild = nbr.needs_rebuild(state, nl)
            state, nl = jax.lax.cond(rebuild, do_rebuild, no_rebuild,
                                     state, nl)
        f_new = level_force(state, nl, level)
        if level == levels.nlevels - 1:
            # aux fixes' force modifications ride the outermost level
            probe = state.replace(f=f_new)
            for fx in fixes:
                probe = fx.post_force(probe)
            f_new = probe.f
        # re-read: the inner recursion refreshed lower-level slots
        fl = state.aux["respa_f"]
        fl = tuple(f_new if i == level else fl[i]
                   for i in range(levels.nlevels))
        state = state.replace(aux={**state.aux, "respa_f": fl})
        return kick(state, f_new, dts[level]), nl

    def setup_forces(state: State, nl) -> State:
        fl = tuple(level_force(state, nl, l)
                   for l in range(levels.nlevels))
        total = sum(fl[1:], fl[0])
        return state.replace(f=total,
                             aux={**state.aux, "respa_f": fl})

    def step(state: State, nl):
        state = state.replace(ntimestep=state.ntimestep + 1)
        for fx in fixes:
            state = fx.initial_integrate(state)
        state, nl = recurse(state, nl, levels.nlevels - 1)
        # total force for thermo/diagnostics
        fl = state.aux["respa_f"]
        state = state.replace(f=sum(fl[1:], fl[0]))
        state = integrator.end_of_step(state)
        for fx in fixes:
            state = fx.end_of_step(state)
        return state, nl

    return step, setup_forces
