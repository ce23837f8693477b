"""Auxiliary (non-integrating) fixes: langevin, setforce, momentum, etc.

TPU-native equivalents of the reference's core fix inventory
(ref: SURVEY.md §2.9 "other core fixes"; src/fix_langevin.cpp,
src/fix_setforce.cpp, src/fix_momentum.cpp, src/fix_enforce2d.cpp,
src/fix_viscous.cpp, src/fix_spring.cpp, src/fix_recenter.cpp,
src/fix_addforce.cpp). Each is a frozen dataclass of compile-time params;
hooks are pure state transforms composed into the jitted step
(ref: Modify's per-hook call lists, src/modify.cpp:389-469).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.state import State
from ..utils.units import Units
from .verlet import AuxFix

Array = jax.Array


def _gmask(state: State, groupbit: int) -> Array:
    return (state.valid_mask & state.group_mask(groupbit))[:, None]


@dataclasses.dataclass(frozen=True)
class FixLangevin(AuxFix):
    """fix langevin: stochastic thermostat in post_force
    (ref: src/fix_langevin.cpp:428-658, SURVEY.md §A.11).

    f += gamma1*v + gamma2*(u-0.5), gamma1 = -m/t_period/ftm2v,
    gamma2 = sqrt(24 kB T m / (t_period dt)) / ftm2v (uniform noise).

    RNG: counter-based jax.random keyed on (seed, ntimestep) — statistically
    equivalent to the reference's per-rank RanMars stream but decomposition-
    invariant by construction (the reference achieves that only for
    `velocity create loop geom`).
    """

    t_start: float = 1.0
    t_stop: float = 1.0
    t_period: float = 1.0
    seed: int = 12345
    dt: float = 0.005
    units: Units = None
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        u = self.units
        m = state.per_atom_mass[:, None]
        # constant target (ramps use the nh_run window if installed)
        if "nh_run" in state.aux:
            run = state.aux["nh_run"]
            begin = run[0].astype(state.dtype)
            span = jnp.maximum(run[1].astype(state.dtype) - begin, 1.0)
            delta = jnp.clip(
                (state.ntimestep.astype(state.dtype) - begin) / span, 0.0, 1.0
            )
        else:
            delta = jnp.zeros((), state.dtype)
        t_target = self.t_start + delta * (self.t_stop - self.t_start)

        gamma1 = -m / self.t_period / u.ftm2v
        gamma2 = (
            jnp.sqrt(24.0 * u.boltz * t_target * m / (self.t_period * self.dt))
            / u.ftm2v
        )
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.seed), state.ntimestep
        )
        noise = jax.random.uniform(key, state.v.shape, state.dtype) - 0.5
        df = gamma1 * state.v + gamma2 * noise
        f = state.f + jnp.where(_gmask(state, self.groupbit), df, 0.0)
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixSetForce(AuxFix):
    """fix setforce: pin force components; None = leave untouched
    (ref: src/fix_setforce.cpp)."""

    fx: float | None = None
    fy: float | None = None
    fz: float | None = None
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)[:, 0]
        f = state.f
        for d, val in enumerate((self.fx, self.fy, self.fz)):
            if val is not None:
                f = f.at[:, d].set(jnp.where(g, val, f[:, d]))
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixAddForce(AuxFix):
    """fix addforce: constant extra force (ref: src/fix_addforce.cpp)."""

    fx: float = 0.0
    fy: float = 0.0
    fz: float = 0.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        add = jnp.asarray([self.fx, self.fy, self.fz], state.dtype)
        f = state.f + jnp.where(_gmask(state, self.groupbit), add[None, :], 0.0)
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixGravity(AuxFix):
    """fix gravity `vector` style: f += m g vhat
    (ref: src/fix_gravity.cpp — used by the SPH water-collapse deck)."""

    g: float = 9.81
    vx: float = 0.0
    vy: float = 0.0
    vz: float = -1.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        v = jnp.asarray([self.vx, self.vy, self.vz], state.dtype)
        vhat = v / jnp.sqrt(jnp.sum(v * v))
        add = (self.g * state.per_atom_mass)[:, None] * vhat[None, :]
        f = state.f + jnp.where(_gmask(state, self.groupbit), add, 0.0)
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixViscous(AuxFix):
    """fix viscous: f -= gamma*v drag (ref: src/fix_viscous.cpp)."""

    gamma: float = 1.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        f = state.f - jnp.where(
            _gmask(state, self.groupbit), self.gamma * state.v, 0.0
        )
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixMomentum(AuxFix):
    """fix momentum: zero the group's linear momentum every N steps
    (ref: src/fix_momentum.cpp; `linear 1 1 1` semantics)."""

    every: int = 1
    groupbit: int = 1
    linear: tuple = (True, True, True)

    def end_of_step(self, state: State) -> State:
        def zero(v):
            g = _gmask(state, self.groupbit)
            m = state.per_atom_mass[:, None]
            mg = jnp.where(g, m, 0.0)
            mtot = jnp.maximum(jnp.sum(mg), 1e-300)
            vcm = jnp.sum(mg * v, axis=0) / mtot
            sel = jnp.asarray([float(s) for s in self.linear], state.dtype)
            return v - jnp.where(g, (vcm * sel)[None, :], 0.0)

        do = jnp.mod(state.ntimestep, self.every) == 0
        v = jax.lax.cond(do, zero, lambda v: v, state.v)
        return state.replace(v=v)


@dataclasses.dataclass(frozen=True)
class FixEnforce2D(AuxFix):
    """fix enforce2d: zero z force/velocity each step
    (ref: src/fix_enforce2d.cpp)."""

    groupbit: int = 1

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)[:, 0]
        f = state.f.at[:, 2].set(jnp.where(g, 0.0, state.f[:, 2]))
        v = state.v.at[:, 2].set(jnp.where(g, 0.0, state.v[:, 2]))
        return state.replace(f=f, v=v)


@dataclasses.dataclass(frozen=True)
class FixSpring(AuxFix):
    """fix spring tether: harmonic pull of the group's COM toward a point
    (ref: src/fix_spring.cpp, `tether K x y z R0` with R0=0)."""

    k: float = 1.0
    x0: tuple = (0.0, 0.0, 0.0)
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)
        m = state.per_atom_mass[:, None]
        mg = jnp.where(g, m, 0.0)
        mtot = jnp.maximum(jnp.sum(mg), 1e-300)
        com = jnp.sum(mg * state.x, axis=0) / mtot
        dr = com - jnp.asarray(self.x0, state.dtype)
        # per-atom share proportional to mass/masstotal
        fadd = -self.k * dr[None, :] * (mg / mtot)
        return state.replace(f=state.f + fadd)


@dataclasses.dataclass(frozen=True)
class FixRecenter(AuxFix):
    """fix recenter: shift group so its COM stays at the initial point
    (ref: src/fix_recenter.cpp, INIT mode)."""

    groupbit: int = 1
    aux_key: str = "recenter_com0"

    def setup(self, state: State) -> State:
        g = _gmask(state, self.groupbit)
        m = state.per_atom_mass[:, None]
        mg = jnp.where(g, m, 0.0)
        mtot = jnp.maximum(jnp.sum(mg), 1e-300)
        com = jnp.sum(mg * state.x, axis=0) / mtot
        return state.replace(aux={**state.aux, self.aux_key: com})

    def end_of_step(self, state: State) -> State:
        g = _gmask(state, self.groupbit)
        m = state.per_atom_mass[:, None]
        mg = jnp.where(g, m, 0.0)
        mtot = jnp.maximum(jnp.sum(mg), 1e-300)
        com = jnp.sum(mg * state.x, axis=0) / mtot
        shift = state.aux[self.aux_key] - com
        x = state.x + jnp.where(g, shift[None, :], 0.0)
        return state.replace(x=x)
