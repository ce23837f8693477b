"""Thermostat/barostat + auxiliary fix tests (physics sanity + invariants)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.integrate.fixes import (
    FixEnforce2D,
    FixLangevin,
    FixMomentum,
    FixSetForce,
)
from lammps_kokkos_port_tpu.integrate.nh import FixNPT, FixNVT
from lammps_kokkos_port_tpu.models.pair_lj import make_lj_cut
from lammps_kokkos_port_tpu.presets import lj_melt_state
from lammps_kokkos_port_tpu.runner import Simulation
from lammps_kokkos_port_tpu.utils.units import get_units

UNITS = get_units("lj")


def melt_sim(integrator=None, fixes=(), cells=5, t_init=1.44, shift=True,
             **kw):
    state = lj_melt_state(cells=cells, t_init=t_init, dtype=jnp.float64)
    pair = make_lj_cut(1, {(1, 1): (1.0, 1.0)}, 2.5, shift=shift,
                       dtype=jnp.float64)
    return Simulation(
        state, pair, dt=0.005, skin=0.3, neigh_every=1, neigh_check=True,
        integrator=integrator, fixes=fixes, **kw
    )


class TestNVT:
    def test_thermostats_to_target(self):
        nvt = FixNVT(dt=0.005, units=UNITS, t_start=0.8, t_stop=0.8,
                     t_period=0.5)
        sim = melt_sim(integrator=nvt, t_init=1.44)
        sim.setup()
        rows = sim.run(600, thermo_every=200)
        temps = [r["temp"] for r in rows[1:]]
        # must relax from 1.44 toward 0.8 and stay near it
        assert abs(temps[-1] - 0.8) < 0.12
        assert np.mean(temps[-2:]) == pytest.approx(0.8, abs=0.12)

    def test_conserved_quantity(self):
        # etotal + thermostat chain energy is the NH conserved quantity
        nvt = FixNVT(dt=0.005, units=UNITS, t_start=1.0, t_stop=1.0,
                     t_period=0.5)
        sim = melt_sim(integrator=nvt, t_init=1.0)
        sim.setup()
        n = int(sim.state.nlocal)

        def conserved():
            row = sim.thermo()
            echain = float(nvt.thermostat_energy(sim.state))
            return row["etotal"] + echain / n  # lj units normalize per atom

        c0 = conserved()
        sim.run(300)
        c1 = conserved()
        assert abs(c1 - c0) < 5e-4

    def test_temperature_ramp(self):
        nvt = FixNVT(dt=0.005, units=UNITS, t_start=1.44, t_stop=0.7,
                     t_period=0.2)
        sim = melt_sim(integrator=nvt, t_init=1.44)
        sim.setup()
        rows = sim.run(500, thermo_every=500)
        assert rows[-1]["temp"] == pytest.approx(0.7, abs=0.1)


class TestNPT:
    def test_pressure_relaxes_toward_target(self):
        npt = FixNPT(
            dt=0.005, units=UNITS, t_start=1.0, t_stop=1.0, t_period=0.5,
            p_start=(2.0, 2.0, 2.0), p_stop=(2.0, 2.0, 2.0),
            p_period=(5.0, 5.0, 5.0), pcouple="iso",
        )
        sim = melt_sim(integrator=npt, t_init=1.0)
        sim.setup()
        v0 = float(sim.state.box.volume)
        rows = sim.run(800, thermo_every=400)
        v1 = float(sim.state.box.volume)
        assert np.isfinite(rows[-1]["etotal"])
        # initial state has P ~ 0.5 at T=1, rho=0.8442 -> target 2.0
        # compresses the box
        assert v1 != v0
        press_late = np.mean([r["press"] for r in rows[1:]])
        assert abs(press_late - 2.0) < 1.5  # relaxing toward target

    def test_box_and_positions_stay_consistent(self):
        npt = FixNPT(
            dt=0.005, units=UNITS, t_start=1.0, t_stop=1.0, t_period=0.5,
            p_start=(0.0,) * 3, p_stop=(0.0,) * 3, p_period=(2.0,) * 3,
        )
        sim = melt_sim(integrator=npt, t_init=1.0)
        sim.setup()
        sim.run(100)
        lam = np.asarray(sim.state.box.to_lamda(sim.state.x))
        n = int(sim.state.nlocal)
        # atoms remain within ~one box length (wrapped on rebuilds)
        assert np.all(np.abs(lam[:n]) < 2.5)


class TestAuxFixes:
    def test_langevin_cools_to_target(self):
        lange = FixLangevin(t_start=0.5, t_stop=0.5, t_period=0.5,
                            seed=7, dt=0.005, units=UNITS)
        sim = melt_sim(fixes=(lange,), t_init=1.44)
        sim.setup()
        rows = sim.run(600, thermo_every=300)
        assert abs(rows[-1]["temp"] - 0.5) < 0.15

    def test_setforce_freezes_forces(self):
        sf = FixSetForce(fx=0.0, fy=0.0, fz=0.0)
        sim = melt_sim(fixes=(sf,), t_init=1.44)
        sim.setup()
        rows = sim.run(20)
        # with zero forces everywhere, velocities never change: T constant
        assert rows[-1]["temp"] == pytest.approx(rows[0]["temp"], rel=1e-10)

    def test_momentum_keeps_com_fixed(self):
        mom = FixMomentum(every=1)
        sim = melt_sim(fixes=(mom,), t_init=1.44)
        sim.setup()
        sim.run(50)
        m = np.asarray(sim.state.per_atom_mass)
        v = np.asarray(sim.state.v)
        n = int(sim.state.nlocal)
        p = (m[:n, None] * v[:n]).sum(axis=0)
        np.testing.assert_allclose(p, 0.0, atol=1e-10)

    def test_enforce2d(self):
        e2d = FixEnforce2D()
        sim = melt_sim(fixes=(e2d,), t_init=1.44)
        sim.setup()
        sim.run(10)
        v = np.asarray(sim.state.v)
        n = int(sim.state.nlocal)
        np.testing.assert_allclose(v[:n, 2], 0.0, atol=1e-14)
