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
