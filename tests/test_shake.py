"""SHAKE/RATTLE constraint tests: rigid water-like trimers in an LJ bath."""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.core.box import Box
from lammps_kokkos_port_tpu.core.state import create_state
from lammps_kokkos_port_tpu.core.topology import build_special, pad_topology
from lammps_kokkos_port_tpu.integrate.shake import make_shake
from lammps_kokkos_port_tpu.models.forcefield import ForceField
from lammps_kokkos_port_tpu.models.pair_lj import make_lj_cut
from lammps_kokkos_port_tpu.runner import Simulation
from lammps_kokkos_port_tpu.utils.units import get_units


def water_like_system(nmol=27, dtype=jnp.float64):
    """Rigid trimers (O-H1, O-H2 bonds + H-H angle constraint) on a grid."""
    rng = np.random.default_rng(7)
    L = 12.0
    r_oh = 0.6
    theta = np.deg2rad(104.0)
    xs, types, mols, bonds, angles = [], [], [], [], []
    grid = round(nmol ** (1 / 3) + 0.49)
    m = 0
    for a in range(grid):
        for b in range(grid):
            for c in range(grid):
                if m >= nmol:
                    break
                o = np.array([a, b, c]) * (L / grid) + 1.0
                h1 = o + r_oh * np.array([1.0, 0.0, 0.0])
                h2 = o + r_oh * np.array([np.cos(theta), np.sin(theta), 0.0])
                i0 = 3 * m
                xs += [o, h1, h2]
                types += [1, 2, 2]
                mols += [m + 1] * 3
                bonds += [[1, i0, i0 + 1], [1, i0, i0 + 2]]
                angles += [[1, i0 + 1, i0, i0 + 2]]
                m += 1
    x = np.asarray(xs)
    box = Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64)
    v = rng.normal(scale=0.3, size=x.shape)
    state = create_state(
        x, box, types=np.asarray(types, np.int32), velocities=v,
        masses=np.array([1.0, 16.0, 1.0]),
        molecules=np.asarray(mols, np.int32), units_name="lj", dtype=dtype,
    )
    cap = state.capacity
    bonds = np.asarray(bonds)
    shake = make_shake(
        cap, bonds, bond_types=[1], bond_r0={1: r_oh},
        angles=np.asarray(angles), angle_types=[1],
        angle_theta0={1: theta},
    )
    # LJ only between oxygens (type 1); H's are ideal-gas-like here
    pair = make_lj_cut(2, {(1, 1): (1.0, 1.0), (2, 2): (0.0, 1.0)},
                       cut_global=2.5, dtype=dtype)
    special = build_special(
        len(x), cap, bonds[:, 1:], weights_lj=(0.0, 0.0, 1.0),
        weights_coul=(0.0, 0.0, 1.0), mode="exclude",
    )
    top = pad_topology(cap, bonds=bonds)
    ff = ForceField(pair=pair, topology=top, special=special)
    return state, ff, shake


class TestShake:
    def test_constraints_hold_and_energy_stable(self):
        state, ff, shake = water_like_system()
        sim = Simulation(state, ff, dt=0.004, skin=0.3, neigh_every=1,
                         neigh_check=True, fixes=(shake,))
        sim.setup()
        v0 = float(shake.max_violation(sim.state))
        assert v0 < 1e-10  # starts on the constraint manifold
        rows = sim.run(200, thermo_every=200)
        v1 = float(shake.max_violation(sim.state))
        assert v1 < 1e-6  # constraints maintained through dynamics
        # no energy explosion (constrained NVE; KE+PE bounded)
        assert np.isfinite(rows[-1]["etotal"])
        assert abs(rows[-1]["etotal"]) < 10 * max(abs(rows[0]["etotal"]), 1.0)

    def test_rattle_removes_bond_rate(self):
        state, ff, shake = water_like_system(nmol=8)
        sim = Simulation(state, ff, dt=0.004, skin=0.3, fixes=(shake,))
        sim.setup()
        sim.run(20)
        st = sim.state
        cap = st.capacity
        ci = np.asarray(shake.ci)
        cj = np.asarray(shake.cj)
        sel = ci < cap
        r = np.asarray(st.box.min_image(st.x[np.minimum(ci, cap - 1)]
                                        - st.x[np.minimum(cj, cap - 1)]))
        v = np.asarray(st.v)
        vij = v[np.minimum(ci, cap - 1)] - v[np.minimum(cj, cap - 1)]
        rate = np.abs((r * vij).sum(-1))[sel]
        assert rate.max() < 1e-6  # d|r|^2/dt ~ 0 on the manifold
