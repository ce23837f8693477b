"""fix-timestep golden fixtures: positions/velocities after 8 steps with
the fix under test applied to the `solute` group (SURVEY.md §4.1; ref:
unittest/force-styles/test_fix_timestep.cpp + 96 fix-timestep-*.yaml)."""

import numpy as np
import pytest

from fixture_harness import run_fix_timestep

FIXTURES = [
    "fix-timestep-nve.yaml",
    "fix-timestep-nve_limit.yaml",
    "fix-timestep-nve_noforce.yaml",
    "fix-timestep-nvt.yaml",
    "fix-timestep-momentum.yaml",
    "fix-timestep-setforce_const.yaml",
    "fix-timestep-addforce_const.yaml",
    "fix-timestep-aveforce_const.yaml",
    "fix-timestep-spring_self.yaml",
    "fix-timestep-spring_tether.yaml",
    "fix-timestep-temp_rescale.yaml",
    "fix-timestep-temp_berendsen.yaml",
    "fix-timestep-planeforce.yaml",
    "fix-timestep-lineforce.yaml",
    "fix-timestep-wall_lj93_const.yaml",
    "fix-timestep-wall_lj126_const.yaml",
    "fix-timestep-wall_lj1043_const.yaml",
    "fix-timestep-wall_harmonic_const.yaml",
    "fix-timestep-wall_morse_const.yaml",
    "fix-timestep-shake_bond.yaml",
    "fix-timestep-shake_angle.yaml",
    "fix-timestep-rattle_bond.yaml",
    "fix-timestep-rattle_angle.yaml",
    "fix-timestep-nvt_mtk.yaml",
    "fix-timestep-nvt_drag.yaml",
    "fix-timestep-npt_iso.yaml",
    "fix-timestep-npt_aniso.yaml",
    "fix-timestep-nph.yaml",
    "fix-timestep-efield_const.yaml",
    "fix-timestep-drag.yaml",
    "fix-timestep-oneway.yaml",
    "fix-timestep-heat.yaml",
    "fix-timestep-heat_region.yaml",
    "fix-timestep-setforce_region.yaml",
    "fix-timestep-spring_couple.yaml",
    "fix-timestep-spring_rg.yaml",
    "fix-timestep-smd_tether.yaml",
    "fix-timestep-smd_couple.yaml",
    "fix-timestep-press_berendsen_iso.yaml",
    "fix-timestep-rigid_single.yaml",
    "fix-timestep-rigid_molecule.yaml",
    "fix-timestep-rigid_group.yaml",
    "fix-timestep-rigid_small.yaml",
    "fix-timestep-rigid_nve_single.yaml",
    "fix-timestep-rigid_nve_molecule.yaml",
    "fix-timestep-rigid_nve_group.yaml",
    "fix-timestep-rigid_nve_small.yaml",
    "fix-timestep-move_linear.yaml",
    "fix-timestep-move_wiggle.yaml",
    "fix-timestep-move_rotate.yaml",
    "fix-timestep-move_transrot.yaml",
    "fix-timestep-rigid_nvt.yaml",
    "fix-timestep-rigid_nvt_small.yaml",
    "fix-timestep-rigid_npt.yaml",
    "fix-timestep-rigid_npt_small.yaml",
    "fix-timestep-rigid_nph.yaml",
    "fix-timestep-rigid_nph_small.yaml",
    "fix-timestep-deform.yaml",
    "fix-timestep-deform_noremap.yaml",
    "fix-timestep-restrain.yaml",
    "fix-timestep-efield_region.yaml",
    "fix-timestep-addtorque_const.yaml",
    "fix-timestep-momentum_chunk.yaml",
    "fix-timestep-spring_chunk.yaml",
    "fix-timestep-setforce_variable.yaml",
    "fix-timestep-addforce_variable.yaml",
    "fix-timestep-aveforce_variable.yaml",
    "fix-timestep-efield_variable.yaml",
    "fix-timestep-addtorque_variable.yaml",
    "fix-timestep-adapt_pair.yaml",
    "fix-timestep-adapt_hybrid.yaml",
    "fix-timestep-adapt_coul.yaml",
    "fix-timestep-wall_table_linear.yaml",
    "fix-timestep-wall_table_spline.yaml",
    "fix-timestep-wall_region_harmonic_const.yaml",
    "fix-timestep-npt_tri.yaml",
    "fix-timestep-deform_tri.yaml",
    "fix-timestep-rigid_molecule_tri.yaml",
    "fix-timestep-nvt-sllod.yaml",
    "fix-timestep-nvt-psllod.yaml",
    "fix-timestep-move_variable.yaml",
    "fix-timestep-temp_csvr.yaml",
    "fix-timestep-temp_csld.yaml",
    "fix-timestep-nve_sphere.yaml",
    "fix-timestep-nvt_sphere.yaml",
    "fix-timestep-nph_sphere.yaml",
    "fix-timestep-npt_sphere_iso.yaml",
    "fix-timestep-npt_sphere_aniso.yaml",
    "fix-timestep-npt_sphere_tri.yaml",
    "fix-timestep-nve_sphere_dipole.yaml",
    "fix-timestep-nve_sphere_dipole_dlm.yaml",
    "fix-timestep-efield_tip4p_const.yaml",
    "fix-timestep-efield_tip4p_variable.yaml",
    "fix-timestep-wall_lepton_const.yaml",
    "fix-timestep-python_move_nve.yaml",
    # NOT onboarded: fix-timestep-brownian.yaml (dated 24 Aug 2020) passes
    # "1.0 1.0 1.0 1.0 1049270" but the reference's CURRENT parser reads
    # arg[4] as an integer seed (src/BROWNIAN/fix_brownian_base.cpp:55
    # utils::inumeric), so the fixture deck errors out on the 2 Aug 2023
    # source this port targets — stale fixture, not a coverage gap.
]

# fixtures whose force field includes PPPM: our grid sizing follows the
# accuracy target (1e-5), not the reference's exact grid/order choice, so
# trajectories agree to the solver accuracy rather than roundoff
LOOSE = {"fix-timestep-adapt_coul.yaml": 1e-6}


@pytest.mark.parametrize("name", FIXTURES)
def test_fix_timestep(name):
    x, v, want_pos, want_vel, prd = run_fix_timestep(name)
    assert x.shape == want_pos.shape
    # compare positions modulo the periodic box (wrap policies may differ)
    dx = x - want_pos
    dx -= prd[None, :] * np.round(dx / prd[None, :])
    tol = LOOSE.get(name, 1e-8)
    scale = max(np.abs(want_pos).max(), 1.0)
    np.testing.assert_allclose(dx, 0.0, atol=scale * tol)
    vscale = max(np.abs(want_vel).max(), 1e-10)
    np.testing.assert_allclose(v, want_vel,
                               atol=max(vscale * tol * 10, tol), rtol=0)
