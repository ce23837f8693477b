"""Library API + minimizer + profiler tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.api import lammps

MELT = """
units lj
lattice fcc 0.8442
region box block 0 5 0 5 0 5
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
neighbor 0.3 bin
neigh_modify every 5 delay 0 check no
fix 1 all nve
"""


@pytest.fixture()
def lmp():
    h = lammps(dtype=jnp.float64)
    h.commands_string(MELT)
    return h


class TestLibraryAPI:
    def test_natoms_and_extracts(self, lmp):
        assert lmp.get_natoms() == 500
        x = lmp.extract_atom("x")
        assert x.shape == (500, 3)
        t = lmp.extract_atom("type")
        assert np.all(t == 1)
        assert lmp.extract_global("units") == "lj"
        lo, hi, xy, yz, xz, per, _ = lmp.extract_box()
        assert hi[0] > 8.0 and per == [True, True, True]

    def test_run_and_thermo(self, lmp):
        lmp.command("run 10")
        assert lmp.get_thermo("temp") == pytest.approx(1.1, abs=0.5)  # KE->PE equipartition from the perfect lattice
        assert np.isfinite(lmp.get_thermo("etotal"))

    def test_gather_scatter_roundtrip(self, lmp):
        v = lmp.gather_atoms("v")
        lmp.scatter_atoms("v", v * 0.0)
        assert lmp.get_thermo("temp") == pytest.approx(0.0, abs=1e-12)


class TestMinimize:
    def test_fire_relaxes_perturbed_crystal(self):
        from lammps_kokkos_port_tpu.integrate.minimize import minimize_fire
        from lammps_kokkos_port_tpu.models.pair_lj import make_lj_cut
        from lammps_kokkos_port_tpu.presets import lj_melt_state
        from lammps_kokkos_port_tpu.runner import Simulation

        rng = np.random.default_rng(0)
        state = lj_melt_state(cells=4, t_init=1.0, dtype=jnp.float64)
        n = int(state.nlocal)
        x = np.asarray(state.x).copy()
        x[:n] += rng.normal(scale=0.05, size=(n, 3))
        state = state.replace(x=jnp.asarray(x), v=state.v * 0.0)
        pair = make_lj_cut(1, {(1, 1): (1.0, 1.0)}, 2.5, dtype=jnp.float64)
        sim = Simulation(state, pair, skin=0.3, neigh_every=1,
                         neigh_check=True)
        sim.setup()
        e0 = sim.thermo()["pe"]
        st, info = minimize_fire(sim, ftol=1e-6, maxiter=2000)
        e1 = sim.thermo()["pe"]
        assert e1 < e0  # relaxed downhill
        assert info["fmax"] < 1e-4
        # the fcc crystal is the minimum: energy near the perfect lattice
        perfect = lj_melt_state(cells=4, t_init=1.0, dtype=jnp.float64)
        sim2 = Simulation(perfect, pair, skin=0.3)
        sim2.setup()
        assert e1 == pytest.approx(sim2.thermo()["pe"], abs=1e-4)

    def test_cg_relaxes(self):
        from lammps_kokkos_port_tpu.integrate.minimize import minimize_cg
        from lammps_kokkos_port_tpu.models.pair_lj import make_lj_cut
        from lammps_kokkos_port_tpu.presets import lj_melt_state
        from lammps_kokkos_port_tpu.runner import Simulation

        rng = np.random.default_rng(1)
        state = lj_melt_state(cells=3, t_init=1.0, dtype=jnp.float64)
        n = int(state.nlocal)
        x = np.asarray(state.x).copy()
        x[:n] += rng.normal(scale=0.03, size=(n, 3))
        state = state.replace(x=jnp.asarray(x), v=state.v * 0.0)
        pair = make_lj_cut(1, {(1, 1): (1.0, 1.0)}, 2.5, dtype=jnp.float64)
        sim = Simulation(state, pair, skin=0.3)
        sim.setup()
        e0 = sim.thermo()["pe"]
        minimize_cg(sim, maxiter=100)
        assert sim.thermo()["pe"] < e0


class TestProfiler:
    def test_profile_and_finish(self):
        from lammps_kokkos_port_tpu.presets import lj_melt_sim
        from lammps_kokkos_port_tpu.utils.timer import (
            finish_report,
            profile_simulation,
        )

        sim = lj_melt_sim(cells=5, t_init=1.44, dtype=jnp.float64)
        sim.setup()
        prof = profile_simulation(sim, nsteps=20)
        assert prof["atom_steps_per_s"] > 0
        assert prof["force_s"] > 0 and prof["neigh_build_s"] > 0
        rows = sim.run(10)
        rep = finish_report(sim, 10, sim.last_loop_time)
        assert "timesteps/s" in rep and "500 atoms" in rep


class TestLibraryExtras:
    def test_extract_compute_fix_variable_setting(self):
        from lammps_kokkos_port_tpu.api import lammps

        lmp = lammps()
        lmp.commands_string("""
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 1.44 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0
neighbor        0.3 bin
variable        two equal 2.0*1.5
compute         myt all temp
fix             1 all nve
run             0
""")
        assert lmp.extract_variable("two") == 3.0
        t = lmp.extract_compute("myt")
        assert 1.3 < float(t) < 1.6
        assert lmp.extract_setting("dimension") == 3
        assert lmp.extract_setting("ntypes") == 1
        assert lmp.extract_setting("q_flag") == 0
        assert lmp.extract_setting("nlocal") == lmp.get_natoms()
        lmp.set_variable("nm", "hello")
        assert lmp.extract_variable("nm") == "hello"
        row = lmp.last_thermo()
        assert "temp" in row and "etotal" in row

    def test_create_atoms_appends(self):
        from lammps_kokkos_port_tpu.api import lammps

        lmp = lammps()
        lmp.commands_string("""
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 3 0 3 0 3
create_box      1 box
create_atoms    1 box
mass            1 1.0
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0
neighbor        0.3 bin
fix             1 all nve
run             0
""")
        n0 = lmp.get_natoms()
        lmp.create_atoms(2, None, [1, 1],
                         [[0.25, 0.25, 0.25], [1.9, 1.9, 1.9]])
        assert lmp.get_natoms() == n0 + 2
        x = lmp.extract_atom("x")
        assert x.shape[0] == n0 + 2
