"""Thermodynamic observables: temp, ke, pe, pressure, total energy.

TPU-native equivalents of the reference computes
(ref: src/compute_temp.cpp, src/compute_pressure.cpp, src/thermo.cpp).
All are pure functions of the state (+ a fresh force/energy/virial
evaluation), jit-compatible, evaluated only on output steps — matching the
reference's eflag/vflag specialization (SURVEY.md §A.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.state import State
from ..utils.units import Units

Array = jax.Array


def temperature(state: State, units: Units, extra_dof: int | None = None) -> Array:
    """T = sum(m v^2) mvv2e / (dof kB), dof = dim*N - extra_dof
    (ref: src/compute_temp.cpp:58-100; extra_dof defaults to the dimension,
    src/compute.cpp:84)."""
    dim = state.dimension
    if extra_dof is None:
        extra_dof = dim
    n = state.nlocal.astype(state.dtype)
    dof = dim * n - extra_dof
    m = state.per_atom_mass
    ke2 = jnp.sum(
        jnp.where(state.valid_mask, m * jnp.sum(state.v * state.v, axis=-1), 0.0)
    )
    tfactor = units.mvv2e / (dof * units.boltz)
    return ke2 * tfactor


def kinetic_energy(state: State, units: Units) -> Array:
    """KE = 0.5 mvv2e sum(m v^2) (ref: src/thermo.cpp compute_ke)."""
    m = state.per_atom_mass
    ke2 = jnp.sum(
        jnp.where(state.valid_mask, m * jnp.sum(state.v * state.v, axis=-1), 0.0)
    )
    return 0.5 * units.mvv2e * ke2


def pressure(
    state: State,
    virial: Array,
    units: Units,
    t: Array | None = None,
    extra_dof: int | None = None,
) -> Array:
    """P = (dof kB T + vxx+vyy+vzz) / (dim V) * nktv2p
    (ref: src/compute_pressure.cpp compute_scalar)."""
    dim = state.dimension
    if extra_dof is None:
        extra_dof = dim
    if t is None:
        t = temperature(state, units, extra_dof)
    n = state.nlocal.astype(state.dtype)
    dof = dim * n - extra_dof
    if dim == 3:
        vol = state.box.volume
    else:
        p = state.box.prd
        vol = p[0] * p[1]
    vtrace = virial[0] + virial[1] + virial[2] if dim == 3 else virial[0] + virial[1]
    return (dof * units.boltz * t + vtrace) / (dim * vol) * units.nktv2p


def pressure_tensor(
    state: State, virial6: Array, units: Units
) -> Array:
    """Voigt pressure tensor (xx,yy,zz,xy,xz,yz) incl. kinetic part
    (ref: src/compute_pressure.cpp compute_vector)."""
    m = state.per_atom_mass[:, None]
    v = jnp.where(state.valid_mask[:, None], state.v, 0.0)
    kxx = jnp.sum(m[:, 0] * v[:, 0] * v[:, 0])
    kyy = jnp.sum(m[:, 0] * v[:, 1] * v[:, 1])
    kzz = jnp.sum(m[:, 0] * v[:, 2] * v[:, 2])
    kxy = jnp.sum(m[:, 0] * v[:, 0] * v[:, 1])
    kxz = jnp.sum(m[:, 0] * v[:, 0] * v[:, 2])
    kyz = jnp.sum(m[:, 0] * v[:, 1] * v[:, 2])
    kin = jnp.stack([kxx, kyy, kzz, kxy, kxz, kyz]) * units.mvv2e
    return (kin + virial6) / state.box.volume * units.nktv2p
