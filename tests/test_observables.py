"""Observable computes: msd, com, ke/atom, rdf sanity."""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.compute import observables as obs
from lammps_kokkos_port_tpu.presets import lj_melt_sim


@pytest.fixture(scope="module")
def sim():
    s = lj_melt_sim(cells=5, t_init=1.44, dtype=jnp.float64,
                    every=5, delay=0, check=False)
    s.setup()
    return s


class TestObservables:
    def test_msd_grows(self, sim):
        x0 = obs.unwrapped(sim.state)
        m0 = np.asarray(obs.msd(sim.state, x0))
        assert m0[3] == pytest.approx(0.0, abs=1e-20)
        sim.run(50)
        m1 = np.asarray(obs.msd(sim.state, x0))
        assert m1[3] > 1e-3  # atoms moved

    def test_com_conserved_in_nve(self, sim):
        c0 = np.asarray(obs.com(sim.state))
        sim.run(20)
        c1 = np.asarray(obs.com(sim.state))
        np.testing.assert_allclose(c1, c0, atol=1e-8)

    def test_ke_atom_sums_to_ke(self, sim):
        from lammps_kokkos_port_tpu.compute.thermo import kinetic_energy

        ka = obs.ke_atom(sim.state)
        total = kinetic_energy(sim.state, sim.units)
        assert float(ka.sum()) == pytest.approx(float(total), rel=1e-12)

    def test_rdf_fcc_structure(self, sim):
        # liquid/solid LJ: g(r) ~ 0 inside the core, peak near r ~ 1.1
        centers, g = obs.rdf(sim.state, nbins=40, nl=sim.nl
                             if hasattr(sim.nl, "idx") else None)
        centers = np.asarray(centers)
        g = np.asarray(g)
        core = g[centers < 0.8]
        assert core.max() < 0.2
        peak_r = centers[np.argmax(g)]
        assert 0.9 < peak_r < 1.4


class TestStressAtom:
    """compute stress/atom: per-atom shares must sum to the global
    pressure tensor identity sum_i S_i = -V P_voigt
    (ref: src/compute_stress_atom.cpp tally = compute_pressure's)."""

    def test_lj_sums_to_pressure_tensor(self, sim):
        from lammps_kokkos_port_tpu.compute.thermo import pressure_tensor

        f, pe, emol, vir = sim.forcefield.compute(sim.state, sim.nl,
                                                  True, True)
        sa = np.asarray(obs.stress_atom(sim))
        ptens = np.asarray(pressure_tensor(sim.state, vir, sim.units))
        vol = float(sim.state.box.volume)
        np.testing.assert_allclose(sa.sum(axis=0), -vol * ptens,
                                   rtol=1e-10, atol=1e-10)

    def test_molecular_sums_to_pressure_tensor(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from fixture_harness import TESTS_DIR, _FIXTS_FF
        from lammps_kokkos_port_tpu.script import LammpsScript
        from lammps_kokkos_port_tpu.compute.thermo import pressure_tensor

        s = LammpsScript(dtype=jnp.float64,
                         var_overrides={"input_dir": TESTS_DIR})
        s.file(f"{TESTS_DIR}/in.fourmol")
        for c in _FIXTS_FF:
            s.one(c)
        s.one("run 0 post no")
        sim = s.sim
        s.one("compute sp all stress/atom NULL")
        sa = s.get_compute("sp")
        f, pe, emol, vir = sim.forcefield.compute(sim.state, sim.nl,
                                                  True, True)
        ptens = np.asarray(pressure_tensor(sim.state, vir, sim.units))
        vol = float(sim.state.box.volume)
        np.testing.assert_allclose(sa.sum(axis=0), -vol * ptens,
                                   rtol=1e-9, atol=1e-7)
