"""Finite-size sphere integration: fix nve/sphere + nvt/npt/nph/sphere.

TPU-native equivalent of src/fix_nve_sphere.cpp and src/fix_nh_sphere.cpp.
Extended particles carry per-atom angular velocity (aux["omega"]), torque
(aux["torque"], filled by torque-producing pair styles each force pass),
radius and rmass; dipole orientation (aux["mu"]) optionally co-rotates.

The rotational update is diagonal (sphere inertia I = 2/5 m r^2,
ref: fix_nve_sphere.cpp:47 `inertia=0.4`):
    omega += dtf/(0.4 r^2 m) * torque     (both half-steps)
and `update dipole` precesses mu with either the renormalized explicit
Euler step (d mu/dt = omega x mu) or the symplectic Dullweber-Leimkuhler-
Maclachlan five-rotation split (`update dipole/dlm`,
fix_nve_sphere.cpp:149-232).

The Nose-Hoover variants add the same omega half-kicks inside nve_v, scale
omega by the thermostat factor in nh_v_temp, and sense temperature through
compute temp/sphere: KE includes the rotational term and each extended
particle counts 6 DOF (ref: fix_nh_sphere.cpp nve_v/nh_v_temp +
compute_temp_sphere.cpp compute_scalar/dof_compute).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.state import State
from .nh import FixNPH, FixNPT, FixNVT
from .verlet import Integrator

Array = jax.Array

INERTIA = 0.4  # sphere moment-of-inertia prefactor (2/5)


def _omega_kick(state: State, gmask: Array, dtf: float) -> State:
    """omega += dtf/inertia / (r^2 m) * torque on group atoms."""
    rad = state.aux["radius"]
    m = state.per_atom_mass
    ok = gmask & (rad > 0.0)[:, None]
    denom = jnp.where(ok[:, 0], INERTIA * rad * rad * m, 1.0)
    om = state.aux["omega"] + jnp.where(
        ok, (dtf / denom)[:, None] * state.aux["torque"], 0.0)
    return state.replace(aux={**state.aux, "omega": om})


def _mu_euler(state: State, gmask: Array, dt: float) -> State:
    """d mu/dt = omega x mu, renormalized to the fixed dipole length."""
    mu = state.aux["mu"]
    mu_len = state.aux["mu_len"]
    om = state.aux["omega"]
    g = mu + dt * jnp.cross(om, mu)
    msq = jnp.sum(g * g, axis=-1)
    scale = mu_len / jnp.sqrt(jnp.where(msq > 0.0, msq, 1.0))
    ok = gmask & (mu_len > 0.0)[:, None]
    return state.replace(aux={
        **state.aux, "mu": jnp.where(ok, g * scale[:, None], mu)})


def _cayley(axis: int, theta: Array) -> Array:
    """[N,3,3] Cayley rotation about a coordinate axis
    (ref: math_extra.cpp BuildRx/Ry/RzMatrix: cos=(1-t^2/4)/(1+t^2/4))."""
    den = 1.0 + 0.25 * theta * theta
    c = (1.0 - 0.25 * theta * theta) / den
    s = theta / den
    one = jnp.ones_like(theta)
    zero = jnp.zeros_like(theta)
    if axis == 0:
        rows = [[one, zero, zero], [zero, c, -s], [zero, s, c]]
    elif axis == 1:
        rows = [[c, zero, s], [zero, one, zero], [-s, zero, c]]
    else:
        rows = [[c, -s, zero], [s, c, zero], [zero, zero, one]]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def _mu_dlm(state: State, gmask: Array, dtf_half: float) -> State:
    """DLM orientation update (fix_nve_sphere.cpp:149-232): map mu to the
    body z-axis via Q, apply the x-y-z-y-x Cayley split with angles
    h*w (2h*w for z, h = dt/2), rotate omega and mu back."""
    mu = state.aux["mu"]
    mu_len = state.aux["mu_len"]
    omega = state.aux["omega"]
    ok = gmask[:, 0] & (mu_len > 0.0)

    inv_len = 1.0 / jnp.where(mu_len > 0.0, mu_len, 1.0)
    a = mu * inv_len[:, None]
    a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
    s2 = a0 * a0 + a1 * a1
    par = s2 == 0.0
    scale = (1.0 - a2) / jnp.where(par, 1.0, s2)
    inv_a2 = 1.0 / jnp.where(par, a2, 1.0)
    zero = jnp.zeros_like(a0)
    q00 = jnp.where(par, inv_a2, 1.0 - scale * a0 * a0)
    q01 = jnp.where(par, zero, -scale * a0 * a1)
    q02 = jnp.where(par, zero, -a0)
    q11 = jnp.where(par, inv_a2, 1.0 - scale * a1 * a1)
    q12 = jnp.where(par, zero, -a1)
    q20 = jnp.where(par, zero, a0)
    q21 = jnp.where(par, zero, a1)
    q22 = jnp.where(par, inv_a2, 1.0 - scale * s2)
    Q = jnp.stack([
        jnp.stack([q00, q01, q02], axis=-1),
        jnp.stack([q01, q11, q12], axis=-1),
        jnp.stack([q20, q21, q22], axis=-1),
    ], axis=-2)

    w = jnp.einsum("nij,nj->ni", Q, omega)  # body frame
    for axis, fac in ((0, 1.0), (1, 1.0), (2, 2.0), (1, 1.0), (0, 1.0)):
        R = _cayley(axis, fac * dtf_half * w[:, axis])
        w = jnp.einsum("nij,nj->ni", R, w)
        Q = jnp.einsum("nji,njk->nik", R, Q)  # Q <- R^T Q

    omega_new = jnp.einsum("nji,nj->ni", Q, w)  # Q^T w
    mu_new = Q[:, 2, :] * mu_len[:, None]
    return state.replace(aux={
        **state.aux,
        "omega": jnp.where(ok[:, None], omega_new, omega),
        "mu": jnp.where(ok[:, None], mu_new, mu),
    })


@dataclasses.dataclass(frozen=True)
class IntegratorNVESphere(Integrator):
    """fix nve/sphere [update dipole|dipole/dlm]."""

    update_style: str = "none"

    def initial_integrate(self, state: State) -> State:
        g = self._gmask(state)
        state = self.nve_v(state)
        state = _omega_kick(state, g, self.dtf)
        state = self.nve_x(state)
        if self.update_style == "dipole":
            state = _mu_euler(state, g, self.dt)
        elif self.update_style == "dipole/dlm":
            state = _mu_dlm(state, g, 0.5 * self.dt)
        return state

    def final_integrate(self, state: State) -> State:
        state = self.nve_v(state)
        return _omega_kick(state, self._gmask(state), self.dtf)


class SphereNH:
    """Mixin adding sphere rotational DOF to the Nose-Hoover family
    (ref: fix_nh_sphere.cpp + compute_temp_sphere.cpp). Must precede the
    FixNVT/NPT/NPH base in the MRO."""

    def nve_v(self, state: State) -> State:
        state = super().nve_v(state)
        return _omega_kick(state, self._gmask(state), self.dtf)

    def _apply_v_scale(self, state: State, scale) -> State:
        state = super()._apply_v_scale(state, scale)
        g = self._gmask(state)
        om = jnp.where(g, state.aux["omega"] * scale, state.aux["omega"])
        return state.replace(aux={**state.aux, "omega": om})

    def _tbit_mask(self, state: State) -> Array:
        return state.valid_mask & state.group_mask(self.tbit)

    def _tdof(self, state: State) -> Array:
        """6 DOF per extended particle, dim per point particle
        (compute_temp_sphere.cpp dof_compute, mode ALL) minus extra."""
        dim = state.dimension
        extra = self.extra_dof if self.extra_dof is not None else dim
        g = self._tbit_mask(state)
        ext = state.aux["radius"] > 0.0
        per = jnp.where(ext, 2 * dim, dim).astype(state.dtype)
        return jnp.sum(jnp.where(g, per, 0.0)) - extra

    def _rot_inertia(self, state: State) -> Array:
        rad = state.aux["radius"]
        return INERTIA * state.per_atom_mass * rad * rad

    def _t_current(self, state: State) -> Array:
        g = self._tbit_mask(state)
        m = jnp.where(g, state.per_atom_mass, 0.0)
        ke = jnp.sum(m * jnp.sum(state.v * state.v, axis=-1))
        om = state.aux["omega"]
        ke = ke + jnp.sum(jnp.where(g, self._rot_inertia(state), 0.0)
                          * jnp.sum(om * om, axis=-1))
        return self.units.mvv2e * ke / (
            jnp.maximum(self._tdof(state), 1.0) * self.units.boltz)

    def _mvv_current(self, state: State):
        g = self._tbit_mask(state)
        m = jnp.where(g, state.per_atom_mass, 0.0)[:, None]
        v = state.v
        ii = jnp.where(g, self._rot_inertia(state), 0.0)[:, None]
        om = state.aux["omega"]
        return (jnp.sum(m * v * v + ii * om * om, axis=0)
                * self.units.mvv2e)

    def _mvv_offdiag(self, state: State):
        g = self._tbit_mask(state)
        m = jnp.where(g, state.per_atom_mass, 0.0)
        ii = jnp.where(g, self._rot_inertia(state), 0.0)
        v = state.v
        om = state.aux["omega"]
        def od(a, b):
            return jnp.sum(m * v[:, a] * v[:, b]
                           + ii * om[:, a] * om[:, b]) * self.units.mvv2e
        return jnp.stack([od(0, 1), od(0, 2), od(1, 2)])


@dataclasses.dataclass(frozen=True)
class FixNVTSphere(SphereNH, FixNVT):
    pass


@dataclasses.dataclass(frozen=True)
class FixNPTSphere(SphereNH, FixNPT):
    pass


@dataclasses.dataclass(frozen=True)
class FixNPHSphere(SphereNH, FixNPH):
    pass
