"""Tersoff tests: golden energy/pressure vs bench/POTENTIALS/log.9Oct20,
force consistency, invariances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.models.pair_tersoff import (
    make_tersoff,
    read_tersoff_file,
)
from lammps_kokkos_port_tpu.presets import tersoff_si_sim

POT = "/root/reference/potentials/Si.tersoff"

# golden from bench/POTENTIALS/log.9Oct20.tersoff.1 (32000 atoms)
GOLDEN0 = dict(temp=1000.0, epair=-148173.19, etotal=-144036.99,
               press=7019.4434)
GOLDEN100 = dict(temp=430.57813, epair=-145815.61, etotal=-144034.65)


class TestReader:
    def test_si_params(self):
        e = read_tersoff_file(POT, ["Si"])
        v = e[("Si", "Si", "Si")]
        assert v[0] == 3.0  # m
        assert v[6] == pytest.approx(22.956)  # n
        assert v[13] == pytest.approx(3264.7)  # A


class TestSmall:
    @pytest.fixture(scope="class")
    def sim(self):
        s = tersoff_si_sim(cells=(4, 4, 4), dtype=jnp.float64)
        s.setup()
        return s

    def test_cohesive_energy_matches_golden(self, sim):
        row = sim.thermo()
        n = row["natoms"]
        assert n == 512
        # perfect-crystal E/atom is size-independent
        assert row["epair"] / n == pytest.approx(-148173.19 / 32000, rel=1e-6)
        assert row["temp"] == pytest.approx(1000.0, rel=1e-10)

    def test_forces_translation_invariant(self, sim):
        st, nl = sim.state, sim.nl
        f1, _, _ = sim.pair_style.compute(st, nl, False, False)
        shift = jnp.asarray([0.13, -0.07, 0.22], dtype=st.dtype)
        st2 = st.replace(x=st.x + shift)
        f2, _, _ = sim.pair_style.compute(st2, nl, False, False)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-8)

    def test_forces_match_finite_difference(self, sim):
        st, nl = sim.state, sim.nl
        # perturb to break symmetry so forces are nonzero
        rng = np.random.default_rng(0)
        x = np.asarray(st.x).copy()
        n = int(st.nlocal)
        x[:n] += rng.normal(scale=0.05, size=(n, 3))
        st = st.replace(x=jnp.asarray(x))

        def e_of(xx):
            _, pe, _ = sim.pair_style.compute(
                st.replace(x=xx), nl, True, False
            )
            return pe

        f, _, _ = sim.pair_style.compute(st, nl, False, False)
        f = np.asarray(f)
        h = 1e-6
        for i in (0, 100, 300):
            for d in range(3):
                xp = x.copy(); xp[i, d] += h
                xm = x.copy(); xm[i, d] -= h
                fd = -(float(e_of(jnp.asarray(xp)))
                       - float(e_of(jnp.asarray(xm)))) / (2 * h)
                assert f[i, d] == pytest.approx(fd, rel=5e-6, abs=1e-7)

    def test_energy_conservation(self, sim):
        rows = sim.run(50, thermo_every=50)
        e0, e1 = rows[0]["etotal"], rows[-1]["etotal"]
        assert abs(e1 - e0) / abs(e0) < 1e-4


@pytest.mark.slow
class TestTersoffFullDeck:
    def test_step0_and_trajectory_golden(self):
        sim = tersoff_si_sim(cells=(20, 20, 10), dtype=jnp.float64)
        sim.setup()
        rows = sim.run(100, thermo_every=50)
        r0, r100 = rows[0], rows[-1]
        assert r0["temp"] == pytest.approx(GOLDEN0["temp"], rel=1e-9)
        assert r0["epair"] == pytest.approx(GOLDEN0["epair"], rel=1e-7)
        assert r0["press"] == pytest.approx(GOLDEN0["press"], rel=1e-4)
        assert r100["temp"] == pytest.approx(GOLDEN100["temp"], rel=1e-3)
        assert r100["etotal"] == pytest.approx(GOLDEN100["etotal"], rel=1e-6)


class TestSW:
    """Stillinger-Weber: golden cohesive energy + FD forces
    (bench/POTENTIALS/log.9Oct20.sw.1: E_pair = -138771.2 for 32000)."""

    @pytest.fixture(scope="class")
    def sim(self):
        from lammps_kokkos_port_tpu.core.box import Box
        from lammps_kokkos_port_tpu.core.lattice import Lattice, create_atoms
        from lammps_kokkos_port_tpu.core.state import create_state
        from lammps_kokkos_port_tpu.core.velocity import create_velocities_geom
        from lammps_kokkos_port_tpu.models.pair_sw import make_sw
        from lammps_kokkos_port_tpu.runner import Simulation
        from lammps_kokkos_port_tpu.utils.units import get_units

        units = get_units("metal")
        lat = Lattice(style="diamond", scale=5.431, units_name="metal")
        sp = lat.spacing
        x, types = create_atoms(lat, np.zeros(3), 4 * sp)
        masses = np.array([1.0, 28.06])
        v = create_velocities_geom(x, masses[types], 1000.0, 376847, units)
        box = Box.create(np.zeros(3), 4 * sp, dtype=jnp.float64)
        st = create_state(x, box, types=types, velocities=v, masses=masses,
                          units_name="metal", dtype=jnp.float64)
        pair = make_sw(1, "/root/reference/potentials/Si.sw", ["Si"],
                       dtype=jnp.float64)
        s = Simulation(st, pair, dt=0.001, skin=1.0, neigh_every=1,
                       neigh_delay=5, neigh_check=True)
        s.setup()
        return s

    def test_cohesive_energy_golden(self, sim):
        row = sim.thermo()
        assert row["epair"] / row["natoms"] == pytest.approx(
            -138771.2 / 32000, rel=1e-6
        )

    def test_forces_fd(self, sim):
        st, nl = sim.state, sim.nl
        rng = np.random.default_rng(1)
        x = np.asarray(st.x).copy()
        n = int(st.nlocal)
        x[:n] += rng.normal(scale=0.05, size=(n, 3))
        st = st.replace(x=jnp.asarray(x))

        def e_of(xx):
            _, pe, _ = sim.pair_style.compute(st.replace(x=xx), nl, True,
                                              False)
            return pe

        f, _, _ = sim.pair_style.compute(st, nl, False, False)
        f = np.asarray(f)
        h = 1e-6
        for i in (3, 77):
            for d in range(3):
                xp = x.copy(); xp[i, d] += h
                xm = x.copy(); xm[i, d] -= h
                fd = -(float(e_of(jnp.asarray(xp)))
                       - float(e_of(jnp.asarray(xm)))) / (2 * h)
                assert f[i, d] == pytest.approx(fd, rel=1e-5, abs=1e-7)

    def test_conservation(self, sim):
        rows = sim.run(50, thermo_every=50)
        assert abs(rows[-1]["etotal"] - rows[0]["etotal"]) / abs(
            rows[0]["etotal"]) < 1e-4
