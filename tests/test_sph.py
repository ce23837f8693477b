"""SPH styles (the fork's defining delta, SURVEY.md §2.11): summation
density against the analytic value, Tait-EOS pressure response, and a
water-collapse-class smoke run through the interpreter."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.core.box import Box
from lammps_kokkos_port_tpu.core.state import create_state
from lammps_kokkos_port_tpu.models.pair_sph import (
    make_sph_rhosum,
    make_sph_taitwater,
)
from lammps_kokkos_port_tpu.ops import neighbor as nbr
from lammps_kokkos_port_tpu.runner import Simulation


def cubic_box(n=6, a=1.0, mass=1.0, jitter=0.0, seed=1):
    rng = np.random.default_rng(seed)
    g = np.arange(n) * a
    x = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1).reshape(-1, 3)
    if jitter:
        x = x + rng.normal(scale=jitter, size=x.shape)
    box = Box.create([0, 0, 0], [n * a] * 3, dtype=jnp.float64)
    state = create_state(x, box, types=np.ones(len(x), np.int32),
                         masses=np.array([1.0, mass]), units_name="lj",
                         dtype=jnp.float64)
    return state


def build_list(state, cut, skin=0.1):
    p = nbr.size_for_system(state, cutneigh=cut + skin, skin=skin)
    nl = nbr.build(state, p)
    while bool(nl.overflow):
        p = nbr.grow(p)
        nl = nbr.build(state, p)
    return nl


class TestRhoSum:
    def test_uniform_lattice_density(self):
        """Summation density on a uniform lattice ~ m * number density
        (the quadric kernel is normalized; ref: PairSPHRhoSum kernel
        constants)."""
        a = 1.0
        state = cubic_box(n=6, a=a, mass=2.5)
        h = 2.2 * a
        style = make_sph_rhosum(1, {(1, 1): (h,)}, dimension=3)
        nl = build_list(state, h)
        rho = np.asarray(style.rho(state, nl))
        valid = np.asarray(jax.device_get(state.valid_mask))
        want = 2.5 / a**3
        np.testing.assert_allclose(rho[valid], want, rtol=0.05)


class TestTaitwater:
    def _pressure_sign(self, scale):
        """Compress (scale<1) -> positive virial (outward pressure)."""
        a = 1.0 * scale
        state = cubic_box(n=6, a=a)
        h = 2.2 * a
        rho0 = 1.0  # uncompressed summation density for a=1, m=1
        pair = make_sph_taitwater(
            1, {(1, 1): (rho0, 10.0, 1.0, h)}, morris=False, dimension=3)
        nl = build_list(state, h)
        f, pe, vir = pair.compute(state, nl, True, True)
        return float(vir[0] + vir[1] + vir[2])

    def test_tait_pressure_response(self):
        assert self._pressure_sign(0.9) > 0  # compressed -> expands
        assert self._pressure_sign(1.1) < 0  # stretched -> contracts

    def test_uniform_lattice_zero_force(self):
        """Perfect lattice at rest: forces cancel by symmetry."""
        state = cubic_box(n=6)
        h = 2.2
        pair = make_sph_taitwater(
            1, {(1, 1): (1.0, 10.0, 1.0, h)}, morris=True, dimension=3)
        nl = build_list(state, h)
        f, _, _ = pair.compute(state, nl, False, False)
        valid = np.asarray(jax.device_get(state.valid_mask))
        assert np.abs(np.asarray(f)[valid]).max() < 1e-9

    def test_morris_viscosity_damps_shear(self):
        """Two-layer counterflow: Morris viscosity forces oppose the
        velocity difference (ref: pair_sph_taitwater_morris.cpp
        Morris 1996 term)."""
        state = cubic_box(n=6, a=1.0)
        x = np.asarray(jax.device_get(state.x))
        v = np.zeros_like(x)
        upper = x[:, 2] > 2.5
        v[upper, 0] = 0.1
        v[~upper, 0] = -0.1
        state = state.replace(v=jnp.asarray(v))
        h = 2.2
        pair = make_sph_taitwater(
            1, {(1, 1): (1.0, 10.0, 5.0, h)}, morris=True, dimension=3)
        nl = build_list(state, h)
        f, _, _ = pair.compute(state, nl, False, False)
        fx = np.asarray(f)[:, 0]
        valid = np.asarray(jax.device_get(state.valid_mask))
        # net drag on the fast layer is negative, on the slow one positive
        assert fx[valid & upper].sum() < -1e-6
        assert fx[valid & ~upper].sum() > 1e-6

    def test_nve_dynamics_stable(self):
        """Jittered box under taitwater/morris, 50 NVE steps: finite and
        momentum-conserving (the dam-break-class smoke)."""
        state = cubic_box(n=6, jitter=0.05)
        h = 2.2
        pair = make_sph_taitwater(
            1, {(1, 1): (1.0, 10.0, 1.0, h)}, morris=True, dimension=3)
        sim = Simulation(state, pair, dt=0.002, skin=0.2, neigh_every=5,
                         neigh_check=False)
        sim.setup()
        rows = sim.run(50, thermo_every=50)
        assert np.isfinite(rows[-1]["temp"])
        v = np.asarray(jax.device_get(sim.state.v))
        m = np.asarray(jax.device_get(sim.state.per_atom_mass))
        valid = np.asarray(jax.device_get(sim.state.valid_mask))
        ptot = (m[valid, None] * v[valid]).sum(0)
        assert np.abs(ptot).max() < 1e-8


GOLD = os.path.join(os.path.dirname(__file__), "goldens", "sph",
                    "water_column_50.dump")

GOLDEN_DECK = """
units           lj
dimension       3
boundary        p p p
atom_style      sph
lattice         sc 1.0
region          box block 0 6 0 6 0 6
create_box      2 box
create_atoms    1 box
region          bottom block INF INF INF INF 0 0.9
set             region bottom type 2
mass            1 1.0
mass            2 1.0
pair_style      hybrid/overlay sph/rhosum 1 sph/taitwater
pair_coeff      * * sph/taitwater 1.0 10.0 1.0 2.2
pair_coeff      * * sph/rhosum 2.2
group           water type 1
group           bc type 2
fix             1 water sph
fix             s bc sph/stationary
fix             g water gravity -0.5 vector 0 0 1
neighbor        0.2 bin
neigh_modify    every 1 delay 0 check no
timestep        0.002
run             50
"""


def _read_dump_frames(path):
    frames = {}
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        ts = int(lines[i + 1])
        n = int(lines[i + 3])
        j = i + 4
        while not lines[j].startswith("ITEM: ATOMS"):
            j += 1
        rows = np.array([[float(x) for x in lines[j + 1 + k].split()]
                         for k in range(n)])
        frames[ts] = rows  # id type x y z vx vy vz, sorted by id
        i = j + 1 + n
    return frames


class TestSPHOracle:
    def test_water_column_reference_golden(self):
        """Reference-binary oracle: a 216-atom water column (water_collapse
        class, ref examples/PACKAGES/sph/water_collapse) under gravity with
        frozen bottom boundary particles — pair hybrid/overlay sph/rhosum +
        sph/taitwater, fix sph (+vest extrapolation, ref fix_sph.cpp
        initial_integrate) and fix sph/stationary. 50 steps; positions and
        velocities pinned to the dumped 17-digit golden within fp64
        accumulation roundoff."""
        from lammps_kokkos_port_tpu.script import LammpsScript

        s = LammpsScript(dtype=jnp.float64)
        for ln in GOLDEN_DECK.strip().splitlines():
            s.one(ln)
        st = s.sim.state
        valid = np.asarray(st.valid_mask)
        order = np.argsort(np.asarray(st.tag)[valid])
        x = np.asarray(st.x)[valid][order]
        v = np.asarray(st.v)[valid][order]

        gold = _read_dump_frames(GOLD)[50]
        L = 6.0
        dxw = x - gold[:, 2:5]
        dxw -= L * np.round(dxw / L)  # wrap-convention-free comparison
        assert np.abs(dxw).max() < 1e-13
        np.testing.assert_allclose(v, gold[:, 5:8], atol=1e-13, rtol=0)


class TestSPHDeck:
    def test_water_collapse_class_deck(self, tmp_path):
        """The canonical hybrid/overlay deck shape through the interpreter
        (ref: examples/PACKAGES/sph/water_collapse/water_collapse.lmp):
        sph/rhosum + sph/taitwater, fix sph + gravity."""
        from lammps_kokkos_port_tpu.script import LammpsScript

        deck = """
units           lj
atom_style      sph
lattice         sc 1.0
region          box block 0 6 0 6 0 6
create_box      1 box
create_atoms    1 box
mass            1 1.0
pair_style      hybrid/overlay sph/rhosum 1 sph/taitwater
pair_coeff      * * sph/taitwater 1.0 10.0 1.0 2.2
pair_coeff      1 1 sph/rhosum 2.2
fix             1 all sph
fix             g all gravity -0.5 vector 0 0 1
neighbor        0.2 bin
neigh_modify    every 5 delay 0 check no
timestep        0.002
thermo          10
run             20
"""
        s = LammpsScript(dtype=jnp.float64)
        for ln in deck.strip().splitlines():
            s.one(ln)
        row = s.sim.thermo()
        assert np.isfinite(row["temp"]) and np.isfinite(row["press"])
        # gravity accelerated the fluid downward
        v = np.asarray(jax.device_get(s.sim.state.v))
        valid = np.asarray(jax.device_get(s.sim.state.valid_mask))
        assert v[valid, 2].mean() < -1e-4
