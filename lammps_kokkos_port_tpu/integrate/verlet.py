"""Velocity-Verlet time integration: the fused, jit-compiled step.

TPU-native redesign of the reference's Verlet::run hot loop
(ref: src/verlet.cpp:229-358 and the fused Kokkos variant
src/KOKKOS/verlet_kokkos.cpp:263-430). One traced `step` function fuses:

    ntimestep++                      (ref: Verlet::run loop head)
    initial_integrate                (fix nve/nvt/npt first hooks)
    -> neighbor decide (+ conditional PBC wrap + rebuild, lax.cond)
    -> force evaluation (pair styles, FULL lists, no reverse comm)
    -> post_force fixes -> final_integrate -> end_of_step fixes

XLA gives us the reference's hand-built kernel fusion (force_clear folded
into the force kernel, back-to-back integrate fusion — ref:
verlet_kokkos.cpp:622-637 fuse_check) for free; there is zero host logic
inside the loop, matching the design target in SURVEY.md §7.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..core.state import State
from ..ops import neighbor as nbr
from ..utils.units import Units

Array = jax.Array

ForceFn = Callable[[State, nbr.NeighborList, bool, bool], tuple]
# (state, nl, eflag, vflag) -> (f, epair, emol, virial)


@dataclasses.dataclass(frozen=True)
class Integrator:
    """Base velocity-Verlet integrator (fix nve semantics, group-aware).

    Subclasses (Nose-Hoover etc.) override the hooks. `dt` and unit
    constants are compile-time constants baked into the step.
    """

    dt: float
    units: Units
    groupbit: int = 1  # group "all"

    # set True by barostats: the force pass must tally the virial every step
    needs_virial: bool = False

    @property
    def dtf(self) -> float:
        return 0.5 * self.dt * self.units.ftm2v

    def setup(self, state: State) -> State:
        """Install any internal (aux) state before the run starts."""
        return state

    def refresh_segment(self, state: State) -> State:
        """Per-run-segment re-setup after the run window (nh_run) is
        installed — barostats freeze their masses here
        (ref: FixNH::setup runs once per `run` command)."""
        return state

    def _gmask(self, state: State) -> Array:
        return (state.valid_mask & state.group_mask(self.groupbit))[:, None]

    def nve_v(self, state: State) -> State:
        """v += dtf/m * f (ref: FixNH::nve_v / FixNVE half kick)."""
        m = state.per_atom_mass[:, None]
        v = state.v + jnp.where(self._gmask(state), self.dtf * state.f / m, 0.0)
        return state.replace(v=v)

    def nve_x(self, state: State) -> State:
        """x += dt*v (ref: FixNH::nve_x / FixNVE drift)."""
        x = state.x + jnp.where(self._gmask(state), self.dt * state.v, 0.0)
        return state.replace(x=x)

    def initial_integrate(self, state: State) -> State:
        """Kick + drift (ref: src/fix_nve.cpp:64-100)."""
        return self.nve_x(self.nve_v(state))

    def final_integrate(self, state: State) -> State:
        """Second half kick (ref: src/fix_nve.cpp:109-141)."""
        return self.nve_v(state)

    def end_of_step(self, state: State) -> State:
        return state


@dataclasses.dataclass(frozen=True)
class IntegratorSPH(Integrator):
    """fix sph: velocity-Verlet plus the vest velocity extrapolation the
    SPH pair styles consume for their velocity-dependent terms (ref:
    src/SPH/fix_sph.cpp initial_integrate — vest = v + 2*dtf/m*f BEFORE
    the half kick; rho/e time integration is unnecessary here because the
    deck pairs it with summation density, pair sph/rhosum)."""

    def setup(self, state: State) -> State:
        if "vest" in state.aux:
            return state
        return state.replace(aux={**state.aux, "vest": state.v})

    def initial_integrate(self, state: State) -> State:
        m = state.per_atom_mass[:, None]
        vest = jnp.where(self._gmask(state),
                         state.v + 2.0 * self.dtf * state.f / m, state.v)
        state = state.replace(aux={**state.aux, "vest": vest})
        return self.nve_x(self.nve_v(state))


@dataclasses.dataclass(frozen=True)
class IntegratorNVELimit(Integrator):
    """fix nve/limit xmax: clamp |v| to xmax/dt after each half kick
    (ref: src/fix_nve_limit.cpp initial/final_integrate)."""

    xmax: float = 0.1

    def _clamp(self, state: State) -> State:
        vlimitsq = (self.xmax / self.dt) ** 2
        vsq = jnp.sum(state.v * state.v, axis=-1, keepdims=True)
        scale = jnp.where(vsq > vlimitsq,
                          jnp.sqrt(vlimitsq / jnp.maximum(vsq, 1e-300)), 1.0)
        v = jnp.where(self._gmask(state), state.v * scale, state.v)
        return state.replace(v=v)

    def initial_integrate(self, state: State) -> State:
        return self.nve_x(self._clamp(self.nve_v(state)))

    def final_integrate(self, state: State) -> State:
        return self._clamp(self.nve_v(state))


@dataclasses.dataclass(frozen=True)
class IntegratorNVENoforce(Integrator):
    """fix nve/noforce: drift only, no kicks
    (ref: src/fix_nve_noforce.cpp)."""

    def initial_integrate(self, state: State) -> State:
        return self.nve_x(state)

    def final_integrate(self, state: State) -> State:
        return state


class AuxFix:
    """Interface for non-integrating fixes (ref: Fix lifecycle hooks,
    src/fix.h:144-222). Override the hooks you need; all are identity by
    default. Implementations are frozen dataclasses (hashable statics) whose
    mutable internals live in state.aux."""

    def setup(self, state: State) -> State:
        return state

    def post_force(self, state: State) -> State:
        return state

    def setup_post_force(self, state: State) -> State:
        """Force hook applied during run setup (ref: Modify::setup ->
        Fix::setup). Most fixes apply the same adjustment as in-run
        post_force; constraint fixes override (SHAKE projects coordinates
        and uses a half-step prediction there, fix_shake.cpp:465-512)."""
        return self.post_force(state)

    def refresh_segment(self, state: State) -> State:
        """Per-run-segment re-init, called AFTER the run window (nh_run)
        is installed (ref: Fix::init runs once per run command)."""
        return state

    def end_of_step(self, state: State) -> State:
        return state

    def initial_integrate(self, state: State) -> State:
        return state

    def post_integrate(self, state: State) -> State:
        """After the position update, before neighboring (ref:
        Fix::post_integrate — SHAKE's slot)."""
        return state

    def final_integrate(self, state: State) -> State:
        return state

    # energy contribution for thermo (ref: Fix::compute_scalar)
    def energy(self, state: State):
        return None


def make_step(
    integrator: Integrator,
    force_fn: ForceFn,
    fixes: Sequence[AuxFix] = (),
    special=None,
    torque_fn=None,
    gran=None,
):
    """Build the jittable single-timestep function.

    step(state, nl) -> (state, nl). Neighbor rebuild happens under lax.cond
    with static shapes; positions are PBC-wrapped (image flags updated) only
    on rebuild steps, as in the reference (Verlet::run calls domain->pbc()
    only when reneighboring, ref: src/verlet.cpp:262-293).
    """
    vflag = integrator.needs_virial or any(
        getattr(fx, "needs_virial", False) for fx in fixes)

    def list_ops(nl):
        from ..ops import cellforce, gridforce, molcell, sortedforce, zwin

        if isinstance(nl, zwin.ZwinCells):
            return zwin
        if isinstance(nl, molcell.MolCells):
            return molcell
        if isinstance(nl, sortedforce.SortedCells):
            return sortedforce
        if isinstance(nl, gridforce.GridCells):
            return gridforce
        return cellforce if isinstance(nl, cellforce.CellListDense) else nbr

    def do_rebuild(state: State, nl):
        x, image = state.box.wrap(state.x, state.image)
        if "deform_vremap" in state.aux:
            # Lees-Edwards boundary: atoms wrapping across a periodic
            # face pick up the streaming-velocity jump (ref: Domain::pbc
            # deform_vremap blocks, src/domain.cpp:571-640)
            hr = state.aux["h_rate"]
            dn = (image - state.image).astype(state.dtype)  # wrap counts
            dvx = dn[:, 0] * hr[0] + dn[:, 1] * hr[5] + dn[:, 2] * hr[4]
            dvy = dn[:, 1] * hr[1] + dn[:, 2] * hr[3]
            dvz = dn[:, 2] * hr[2]
            v = state.v - jnp.stack([dvx, dvy, dvz], axis=-1)
            state = state.replace(v=v)
        state = state.replace(x=x, image=image)
        ops = list_ops(nl)
        if hasattr(ops, "rebuild_state"):
            # cell-major mode: the rebuild permutes the state itself
            return ops.rebuild_state(state, nl, special=special)
        nl2 = ops.rebuild_merge(state, nl, special=special)
        if gran is not None:
            # carry per-contact shear history across the rebuild
            # (FixNeighHistory::pre_exchange analog)
            from ..ops import gridforce as _gf

            if isinstance(nl2, _gf.GridCells):
                from ..ops.grangrid import remap_shear_grid

                sh = remap_shear_grid(state.aux["gran_shear"], nl.buckets,
                                      nl2.buckets, nl2.params,
                                      state.capacity)
            else:
                from ..models.pair_gran import remap_shear

                sh = remap_shear(state.aux["gran_shear"], nl.idx, nl2.idx)
            state = state.replace(aux={**state.aux, "gran_shear": sh})
        return state, nl2

    def no_rebuild(state: State, nl):
        return state, list_ops(nl).tick(nl)

    def step(state: State, nl):
        state = state.replace(ntimestep=state.ntimestep + 1)
        for fx in fixes:
            state = fx.initial_integrate(state)
        state = integrator.initial_integrate(state)
        for fx in fixes:
            state = fx.post_integrate(state)
        rebuild = list_ops(nl).needs_rebuild(state, nl)
        state, nl = jax.lax.cond(rebuild, do_rebuild, no_rebuild, state, nl)
        if gran is not None:
            f, tq, sh = gran.compute_gran(
                state, nl, state.aux["gran_shear"], True)
            state = state.replace(f=f, aux={
                **state.aux, "torque": tq, "gran_shear": sh})
            for fx in fixes:
                state = fx.post_force(state)
            for fx in fixes:
                state = fx.final_integrate(state)
            state = integrator.final_integrate(state)
            state = integrator.end_of_step(state)
            for fx in fixes:
                state = fx.end_of_step(state)
            return state, nl
        f, _, _, virial = force_fn(state, nl, False, vflag)
        if vflag:
            state = state.replace(f=f, virial=virial)
        else:
            state = state.replace(f=f)
        if torque_fn is not None:
            # torque-producing pair styles refresh atom->torque alongside
            # the forces (ref: pair compute torque[i] accumulation)
            state = state.replace(aux={
                **state.aux, "torque": torque_fn(state, nl)})
        for fx in fixes:
            state = fx.post_force(state)
        for fx in fixes:
            state = fx.final_integrate(state)
        state = integrator.final_integrate(state)
        state = integrator.end_of_step(state)
        for fx in fixes:
            state = fx.end_of_step(state)
        return state, nl

    return step
