"""fix shake / rattle: holonomic bond (and angle) constraints.

TPU-native equivalent of the reference's SHAKE
(ref: src/RIGID/fix_shake.cpp — cluster discovery :1782-1900, per-cluster
Lagrange solves in post_force :630; Kokkos twin fix_shake_kokkos.cpp; needed
for the rhodopsin benchmark, bench/in.rhodo:16).

Design difference: the reference solves each 2/3/4-atom cluster's
multipliers analytically inside the force pass; here the classic
SHAKE/RATTLE splitting runs as fixed-iteration Jacobi sweeps over ALL
constraints at once (clusters are disjoint and tiny, so a handful of
damped sweeps converges to machine tolerance) — fully vectorized
scatter-adds, no per-cluster control flow:

  - post_integrate: iterative position correction along the pre-step bond
    directions (SHAKE),
  - end_of_step: velocity projection (RATTLE) so v stays tangent to the
    constraint manifold.

Angle constraints (e.g. the water H-H distance) become a third distance
constraint, exactly like `fix shake ... a <angletypes>` in the reference.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from .verlet import AuxFix

Array = jax.Array

AUX_X0 = "shake_x0"


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ci", "cj", "d0"],
    meta_fields=["iters", "viters", "groupbit", "ncons"],
)
@dataclasses.dataclass(frozen=True)
class FixShake(AuxFix):
    """Distance constraints (ci, cj, d0); padded entries have ci == cap."""

    ci: Array  # [NC] int32
    cj: Array  # [NC] int32
    d0: Array  # [NC]
    iters: int = 50
    viters: int = 50
    groupbit: int = 1
    ncons: int = 0  # true (unpadded) count; removes one DOF each
                    # (ref: FixShake::dof, src/RIGID/fix_shake.cpp)

    # -- hooks ---------------------------------------------------------------

    def setup(self, state: State) -> State:
        # key must exist before the scan starts (stable carry structure)
        return state.replace(aux={**state.aux, AUX_X0: state.x})

    def initial_integrate(self, state: State) -> State:
        # stash pre-step positions: constraint gradients are evaluated at
        # the old geometry (classic SHAKE)
        return state.replace(aux={**state.aux, AUX_X0: state.x})

    def post_integrate(self, state: State) -> State:
        cap = state.capacity
        x0 = state.aux[AUX_X0]
        m = state.per_atom_mass
        ci = jnp.clip(self.ci, 0, cap - 1)
        cj = jnp.clip(self.cj, 0, cap - 1)
        valid = (self.ci < cap)
        invmi = jnp.where(valid, 1.0 / m[ci], 0.0)
        invmj = jnp.where(valid, 1.0 / m[cj], 0.0)
        r_old = state.box.min_image(x0[ci] - x0[cj])  # fixed directions
        d0sq = self.d0 * self.d0

        def body(_, x):
            r_new = state.box.min_image(x[ci] - x[cj])
            diff = d0sq - jnp.sum(r_new * r_new, axis=-1)
            denom = 2.0 * jnp.sum(r_new * r_old, axis=-1) * (invmi + invmj)
            g = jnp.where(valid, diff / jnp.where(
                jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
            dxi = (g * invmi)[:, None] * r_old
            dxj = -(g * invmj)[:, None] * r_old
            x = x.at[self.ci].add(dxi, mode="drop")
            x = x.at[self.cj].add(dxj, mode="drop")
            return x

        x = jax.lax.fori_loop(0, self.iters, body, state.x)
        return state.replace(x=x)

    def end_of_step(self, state: State) -> State:
        """RATTLE velocity projection (ref: fix_rattle semantics)."""
        cap = state.capacity
        m = state.per_atom_mass
        ci = jnp.clip(self.ci, 0, cap - 1)
        cj = jnp.clip(self.cj, 0, cap - 1)
        valid = self.ci < cap
        invmi = jnp.where(valid, 1.0 / m[ci], 0.0)
        invmj = jnp.where(valid, 1.0 / m[cj], 0.0)
        r = state.box.min_image(state.x[ci] - state.x[cj])
        r2 = jnp.sum(r * r, axis=-1)

        def body(_, v):
            vij = v[ci] - v[cj]
            lam = jnp.where(
                valid,
                jnp.sum(vij * r, axis=-1) / (r2 * (invmi + invmj) + 1e-300),
                0.0,
            )
            v = v.at[self.ci].add(-(lam * invmi)[:, None] * r, mode="drop")
            v = v.at[self.cj].add((lam * invmj)[:, None] * r, mode="drop")
            return v

        v = jax.lax.fori_loop(0, self.viters, body, state.v)
        return state.replace(v=v)

    # -- diagnostics ----------------------------------------------------------

    def max_violation(self, state: State) -> Array:
        cap = state.capacity
        ci = jnp.clip(self.ci, 0, cap - 1)
        cj = jnp.clip(self.cj, 0, cap - 1)
        valid = self.ci < cap
        r = state.box.min_image(state.x[ci] - state.x[cj])
        d = jnp.sqrt(jnp.sum(r * r, axis=-1))
        return jnp.max(jnp.where(valid, jnp.abs(d - self.d0), 0.0))

    @property
    def n_constraints(self) -> int:
        return self.ncons


def make_shake(
    cap: int,
    bonds: np.ndarray,  # [NB, 3] (type, i, j) local indices
    bond_types: list[int],
    bond_r0: dict[int, float],
    angles: np.ndarray | None = None,  # [NA, 4] (type, i, j, k)
    angle_types: list[int] | None = None,
    angle_theta0: dict[int, float] | None = None,  # radians
    pad_multiple: int = 8,
    dtype=jnp.float64,
) -> FixShake:
    """Build the constraint list like `fix shake b <btypes> a <atypes>`
    (ref: FixShake::init cluster setup): constrained bonds pin their
    equilibrium length; constrained angles add the 1-3 distance from the
    law of cosines over the two constrained bonds."""
    ci, cj, d0 = [], [], []
    bond_len = {}
    for t, i, j in np.asarray(bonds):
        if int(t) in bond_types:
            ci.append(int(i))
            cj.append(int(j))
            d0.append(bond_r0[int(t)])
            bond_len[(int(i), int(j))] = bond_r0[int(t)]
            bond_len[(int(j), int(i))] = bond_r0[int(t)]
    if angles is not None and angle_types:
        for t, i, j, k in np.asarray(angles):
            if int(t) in angle_types:
                r1 = bond_len.get((int(i), int(j)))
                r2 = bond_len.get((int(k), int(j)))
                if r1 is None or r2 is None:
                    raise ValueError(
                        "shake angle requires both flanking bonds constrained"
                    )
                th = angle_theta0[int(t)]
                d13 = np.sqrt(r1 * r1 + r2 * r2
                              - 2.0 * r1 * r2 * np.cos(th))
                ci.append(int(i))
                cj.append(int(k))
                d0.append(d13)
    n = len(ci)
    npad = max(((n + pad_multiple - 1) // pad_multiple) * pad_multiple,
               pad_multiple)
    a_ci = np.full(npad, cap, dtype=np.int32)
    a_cj = np.full(npad, cap, dtype=np.int32)
    a_d0 = np.ones(npad)
    a_ci[:n] = ci
    a_cj[:n] = cj
    a_d0[:n] = d0
    return FixShake(
        ci=jnp.asarray(a_ci), cj=jnp.asarray(a_cj),
        d0=jnp.asarray(a_d0, dtype=dtype), ncons=n,
    )
