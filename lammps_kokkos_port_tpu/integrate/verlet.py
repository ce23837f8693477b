"""Velocity-Verlet time integration: the fused, jit-compiled step.

TPU-native redesign of the reference's Verlet::run hot loop
(ref: src/verlet.cpp:229-358 and the fused Kokkos variant
src/KOKKOS/verlet_kokkos.cpp:263-430). One traced `step` function fuses:

    initial_integrate (half-kick + drift, ref: src/fix_nve.cpp:64-141)
    -> neighbor decide (+ conditional PBC wrap + rebuild, lax.cond)
    -> force evaluation (pair styles, FULL lists, no reverse comm)
    -> final_integrate (second half-kick)

XLA gives us the reference's hand-built kernel fusion (force_clear folded
into the force kernel, back-to-back integrate fusion — ref:
verlet_kokkos.cpp:622-637 fuse_check) for free; there is zero host logic
inside the loop, matching the design target in SURVEY.md §7.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.state import State
from ..ops import neighbor as nbr
from ..utils.units import Units

Array = jax.Array

ForceFn = Callable[[State, nbr.NeighborList, bool, bool], tuple]
# (state, nl, eflag, vflag) -> (f, pe, virial)


@dataclasses.dataclass(frozen=True)
class Integrator:
    """Base velocity-Verlet integrator (fix nve semantics).

    Subclasses (Nose-Hoover etc.) override the four hooks. `dt` and unit
    constants are compile-time constants baked into the step.
    """

    dt: float
    units: Units

    @property
    def dtf(self) -> float:
        return 0.5 * self.dt * self.units.ftm2v

    def initial_integrate(self, state: State) -> State:
        """v += dtf/m * f;  x += dt*v  (ref: src/fix_nve.cpp:64-100)."""
        m = state.per_atom_mass[:, None]
        mask = state.valid_mask[:, None]
        v = state.v + jnp.where(mask, self.dtf * state.f / m, 0.0)
        x = state.x + jnp.where(mask, self.dt * v, 0.0)
        return state.replace(x=x, v=v)

    def final_integrate(self, state: State) -> State:
        """v += dtf/m * f  (ref: src/fix_nve.cpp:109-141)."""
        m = state.per_atom_mass[:, None]
        mask = state.valid_mask[:, None]
        v = state.v + jnp.where(mask, self.dtf * state.f / m, 0.0)
        return state.replace(v=v)

    def end_of_step(self, state: State) -> State:
        return state

    def post_force(self, state: State) -> State:
        return state


def make_step(
    integrator: Integrator,
    force_fn: ForceFn,
):
    """Build the jittable single-timestep function.

    step(state, nl) -> (state, nl). Neighbor rebuild happens under lax.cond
    with static shapes; positions are PBC-wrapped (image flags updated) only
    on rebuild steps, as in the reference (Verlet::run calls domain->pbc()
    only when reneighboring, ref: src/verlet.cpp:262-293).
    """

    def do_rebuild(state: State, nl: nbr.NeighborList):
        x, image = state.box.wrap(state.x, state.image)
        # keep padded atoms pinned (wrap of padding is identity anyway)
        state = state.replace(x=x, image=image)
        new = nbr.rebuild_merge(state, nl)
        disp = state.x - nl.xhold  # danger tracking is approximate post-wrap
        return state, new

    def no_rebuild(state: State, nl: nbr.NeighborList):
        return state, nbr.tick(nl)

    def step(state: State, nl: nbr.NeighborList):
        state = integrator.initial_integrate(state)
        rebuild = nbr.needs_rebuild(state, nl)
        state, nl = jax.lax.cond(rebuild, do_rebuild, no_rebuild, state, nl)
        f, _, _ = force_fn(state, nl, False, False)
        state = state.replace(f=f)
        state = integrator.post_force(state)
        state = integrator.final_integrate(state)
        state = integrator.end_of_step(state)
        return state, nl

    return step


def make_run_segment(step_fn):
    """lax.scan over n steps (n static); returns the jitted segment runner."""

    def run_segment(state: State, nl: nbr.NeighborList, nsteps: int):
        def body(carry, _):
            s, l = carry
            s, l = step_fn(s, l)
            return (s, l), None

        (state, nl), _ = jax.lax.scan(body, (state, nl), None, length=nsteps)
        return state, nl

    return jax.jit(run_segment, static_argnums=2)
