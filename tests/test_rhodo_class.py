"""Rhodo-class integration: CHARMM bonded terms + lj/charmm/coul/long +
PPPM + NPT (+ SHAKE) on the fourmol molecular system — the full stack the
rhodopsin benchmark exercises (bench/in.rhodo; its data file is stripped
from the mirror, so fourmol stands in at small scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixture_harness import TESTS_DIR, build_fourmol
from lammps_kokkos_port_tpu.models import bonded
from lammps_kokkos_port_tpu.models.ewald import Ewald, g_ewald_estimate
from lammps_kokkos_port_tpu.models.forcefield import ForceField
from lammps_kokkos_port_tpu.models.pppm import PPPM
from lammps_kokkos_port_tpu.models.pair_charmm import make_lj_charmm_coul_long
from lammps_kokkos_port_tpu.runner import Simulation
from lammps_kokkos_port_tpu.utils.units import get_units

UNITS = get_units("real")

PAIR_COEFFS = {
    (1, 1): (0.02, 2.5), (2, 2): (0.005, 1.0), (2, 4): (0.005, 0.5),
    (3, 3): (0.02, 3.2), (4, 4): (0.015, 3.1), (5, 5): (0.015, 3.1),
}
BOND_COEFFS = {1: (250.0, 1.5), 2: (300.0, 1.1), 3: (350.0, 1.3),
               4: (650.0, 1.2), 5: (450.0, 1.0)}
ANGLE_COEFFS = {1: (75.0, 110.1, 0.0, 0.0), 2: (45.0, 111.0, 0.0, 0.0),
                3: (50.0, 120.0, 0.0, 0.0), 4: (100.0, 108.5, 0.0, 0.0)}
DIHEDRAL_COEFFS = {1: (0.5, 2, 180.0), 2: (0.1, 3, 0.0), 3: (0.2, 1, 0.0),
                   4: (0.8, 2, 180.0), 5: (0.1, 3, 0.0)}
IMPROPER_COEFFS = {1: (10.0, 0.0), 2: (12.0, 0.0)}


def build_rhodo_class(kspace="pppm", dtype=jnp.float64, g_ewald=0.25,
                      dynamic=False):
    df, state, top, special = build_fourmol(dtype=dtype)
    pair = make_lj_charmm_coul_long(
        df.natomtypes, PAIR_COEFFS, cut_lj_inner=6.0, cut_lj=7.0,
        cut_coul=7.0, g_ewald=g_ewald, dtype=dtype,
    )
    if kspace == "pppm":
        ks = PPPM.create(state.box, g_ewald, grid=(15, 15, 15), order=5,
                         dtype=dtype, dynamic=dynamic)
    elif kspace == "ewald":
        ks = Ewald.create(state.box, g_ewald, accuracy_rel=1e-7, dtype=dtype,
                          dynamic=dynamic)
    else:
        ks = None
    ff = ForceField(
        pair=pair,
        bond=bonded.make_bond_harmonic(df.nbondtypes, BOND_COEFFS, dtype=dtype),
        angle=bonded.make_angle_charmm(df.nangletypes, ANGLE_COEFFS, dtype=dtype),
        dihedral=bonded.make_dihedral_charmm(
            df.ndihedraltypes, DIHEDRAL_COEFFS, dtype=dtype),
        improper=bonded.make_improper_harmonic(
            df.nimpropertypes, IMPROPER_COEFFS, dtype=dtype),
        kspace=ks,
        topology=top,
        special=special,
    )
    return df, state, ff


class TestRhodoClass:
    def test_pppm_matches_ewald_in_full_stack(self):
        """Total forces with PPPM vs exact Ewald k-space in the complete
        molecular force field."""
        _, state, ff_p = build_rhodo_class("pppm")
        _, _, ff_e = build_rhodo_class("ewald")
        sim_p = Simulation(state, ff_p, dt=0.5, skin=2.0)
        sim_p.setup()
        f_p, ep_p, em_p, _ = sim_p.force_fn(sim_p.state, sim_p.nl, True, False)
        sim_e = Simulation(state, ff_e, dt=0.5, skin=2.0)
        sim_e.setup()
        f_e, ep_e, em_e, _ = sim_e.force_fn(sim_e.state, sim_e.nl, True, False)
        n = int(state.nlocal)
        scale = np.abs(np.asarray(f_e)[:n]).max()
        np.testing.assert_allclose(
            np.asarray(f_p)[:n], np.asarray(f_e)[:n], atol=2e-3 * scale
        )
        assert float(ep_p) == pytest.approx(float(ep_e), rel=2e-4)
        assert float(em_p) == pytest.approx(float(em_e), rel=1e-12)

    def test_npt_pppm_dynamics(self):
        """NPT + PPPM: the rhodo run style. Box responds to pressure; all
        thermo stays finite."""
        from lammps_kokkos_port_tpu.integrate.nh import FixNPT

        _, state, ff = build_rhodo_class("pppm", dynamic=True)
        npt = FixNPT(
            dt=0.5, units=UNITS, t_start=200.0, t_stop=200.0, t_period=50.0,
            p_start=(0.0,) * 3, p_stop=(0.0,) * 3, p_period=(500.0,) * 3,
        )
        sim = Simulation(state, ff, dt=0.5, skin=2.0, integrator=npt,
                         neigh_every=2, neigh_check=True)
        sim.setup()
        v0 = float(sim.state.box.volume)
        rows = sim.run(40, thermo_every=20)
        assert all(np.isfinite(r["etotal"]) for r in rows)
        assert all(np.isfinite(r["press"]) for r in rows)
        v1 = float(sim.state.box.volume)
        assert v1 != v0  # barostat moved the cell

    def test_pppm_influence_matches_create(self):
        """The traced influence(box) must reproduce the create()-time numpy
        G(k) exactly (same aliasing sums, same box)."""
        _, state, ff = build_rhodo_class("pppm", dynamic=True)
        gf_traced = np.asarray(jax.jit(ff.kspace.influence)(state.box))
        np.testing.assert_allclose(
            gf_traced, np.asarray(ff.kspace.gf), rtol=1e-12, atol=1e-18
        )

    def test_dynamic_kspace_tracks_box_change(self):
        """After a box rescale (what NPT does each half-step), a dynamic
        PPPM/Ewald must match a solver freshly created at the NEW box
        (ref: fix_nh.cpp:874-876 kspace->setup() after remap)."""
        import dataclasses

        for kname in ("pppm", "ewald"):
            _, state, ff = build_rhodo_class(kname, dynamic=True)
            ks_dyn = ff.kspace
            scale = 0.95
            box = state.box
            center = 0.5 * (box.lo + box.hi)
            new_box = dataclasses.replace(
                box, lo=(box.lo - center) * scale + center,
                hi=(box.hi - center) * scale + center,
            )
            x_new = new_box.to_box(box.to_lamda(state.x))
            shrunk = state.replace(x=x_new, box=new_box)

            if kname == "pppm":
                ks_new = PPPM.create(new_box, ks_dyn.g_ewald,
                                     grid=ks_dyn.ngrid, order=ks_dyn.order,
                                     dtype=jnp.float64)
            else:
                ks_new = Ewald.create(new_box, ks_dyn.g_ewald,
                                      accuracy_rel=1e-7, dtype=jnp.float64)

            f_dyn, e_dyn, v_dyn = ks_dyn.compute(shrunk, True, True)
            f_new, e_new, v_new = ks_new.compute(shrunk, True, True)
            n = int(state.nlocal)
            fscale = np.abs(np.asarray(f_new)[:n]).max()
            # Ewald re-selects its mode set at create(); the 5% rescale
            # admits a few extra shell modes -> small tail difference
            tol = 1e-10 if kname == "pppm" else 2e-5
            np.testing.assert_allclose(
                np.asarray(f_dyn)[:n], np.asarray(f_new)[:n],
                atol=tol * fscale,
            )
            assert float(e_dyn) == pytest.approx(float(e_new), rel=1e-4), kname

    def test_npt_pppm_conserved_quantity(self):
        """NH invariant (etotal + thermostat + barostat energy) under
        NPT+PPPM with a strong compression: the dynamic (box-coupled)
        influence function must conserve it far better than a frozen-box
        gf — the regression for fix_nh.cpp:874-876 kspace->setup()."""
        from lammps_kokkos_port_tpu.integrate.nh import FixNPT

        drifts = {}
        vols = {}
        for dyn in (True, False):
            _, state, ff = build_rhodo_class("pppm", g_ewald=0.35,
                                             dynamic=dyn)
            npt = FixNPT(
                dt=0.05, units=UNITS, t_start=150.0, t_stop=150.0,
                t_period=20.0, p_start=(8000.0,) * 3, p_stop=(8000.0,) * 3,
                p_period=(100.0,) * 3,
            )
            sim = Simulation(state, ff, dt=0.05, skin=2.0, integrator=npt,
                             neigh_every=1, neigh_check=False)
            sim.setup()

            def invariant():
                row = sim.thermo()
                e_nh = float(jax.device_get(
                    npt.thermostat_energy(sim.state)
                    + npt.barostat_energy(sim.state)))
                # real units: etotal is extensive (norm_default off)
                return row["etotal"] + e_nh

            e0 = invariant()
            sim.run(480)
            drifts[dyn] = abs(invariant() - e0)
            vols[dyn] = float(sim.state.box.volume)

        v0 = float(jax.device_get(state.box.volume))
        assert abs(vols[True] - v0) / v0 > 0.1, "box never compressed"
        # ~28% compression: the stale gf leaks energy (measured ~2.6
        # kcal/mol); the box-coupled one conserves to integration error
        assert drifts[True] < 0.5, drifts
        assert drifts[True] < 0.25 * drifts[False], drifts

    def test_nve_energy_conservation_full_stack(self):
        """NVE with every-step rebuilds: the complete molecular+PPPM stack
        must conserve energy (the strongest integration test of force
        consistency across pair+bonded+kspace)."""
        _, state, ff = build_rhodo_class("pppm")
        sim = Simulation(state, ff, dt=0.1, skin=2.0, neigh_every=1,
                         neigh_check=False)
        sim.setup()
        rows = sim.run(100, thermo_every=100)
        e0, e1 = rows[0]["etotal"], rows[-1]["etotal"]
        # real units, 29 atoms, energies O(1e2) kcal/mol
        assert abs(e1 - e0) < 0.5
