"""End-to-end golden test: the LJ melt deck vs the reference's committed log.

Reference: examples/melt/in.melt + examples/melt/log.8Apr21.melt.g++.1
(SURVEY.md §A.16). `velocity ... loop geom` is decomposition-invariant, so
step-0 thermo must match to fp64 roundoff; trajectory values at later steps
must match within accumulation-order tolerance (the physics is identical,
only summation order differs).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.models import pair as pair_mod
from lammps_kokkos_port_tpu.presets import lj_melt_sim

# golden thermo rows from examples/melt/log.8Apr21.melt.g++.1
GOLDEN = {
    0: dict(temp=3.0, epair=-6.7733681, etotal=-2.2744931, press=-3.7033504),
    50: dict(temp=1.6842865, epair=-4.8082494, etotal=-2.2824513, press=5.5666131),
}
GOLDEN_250 = dict(temp=1.6645597, epair=-4.7774327, etotal=-2.2812174, press=5.7526089)


@pytest.fixture(scope="module")
def melt_sim():
    # matrix list mode: trajectory goldens depend on the reference's
    # frozen-list missed-pair pattern under `every 20 check no`; the
    # cell-dense path sees pairs entering the cutoff between rebuilds
    # (physically tighter, but a different trajectory)
    sim = lj_melt_sim(cells=10, t_init=3.0, seed=87287, dtype=jnp.float64)
    sim.forcefield = sim.forcefield  # noqa - explicitness
    sim._list_mode_req = "matrix"
    sim.setup()
    return sim


def test_cell_dense_matches_matrix_with_fresh_lists():
    """With every-step rebuilds both engines see identical pair sets, so
    trajectories must agree to roundoff."""
    results = {}
    for mode in ("matrix", "cell"):
        sim = lj_melt_sim(cells=6, t_init=1.44, dtype=jnp.float64,
                          every=1, delay=0, check=False)
        sim._list_mode_req = mode
        sim.setup()
        rows = sim.run(20)
        results[mode] = (np.asarray(sim.state.x).copy(), rows[-1]["etotal"])
    np.testing.assert_allclose(results["cell"][0], results["matrix"][0],
                               atol=1e-11)
    assert results["cell"][1] == pytest.approx(results["matrix"][1],
                                               rel=1e-12)


class TestMeltGolden:
    def test_step0_exact(self, melt_sim):
        row = melt_sim.thermo()
        g = GOLDEN[0]
        assert row["natoms"] == 4000
        assert row["temp"] == pytest.approx(g["temp"], abs=1e-9)
        assert row["epair"] == pytest.approx(g["epair"], abs=2e-7)
        assert row["etotal"] == pytest.approx(g["etotal"], abs=2e-7)
        assert row["press"] == pytest.approx(g["press"], abs=2e-6)

    def test_forces_match_autodiff(self, melt_sim):
        import jax

        sim = melt_sim
        st, nl = sim.state, sim.nl

        def energy(x):
            _, pe, _, _ = sim.force_fn(st.replace(x=x), nl, True, False)
            return pe

        f, _, _, _ = sim.force_fn(st, nl, False, False)
        f_ad = -jax.grad(energy)(st.x)
        np.testing.assert_allclose(np.asarray(f), np.asarray(f_ad), atol=1e-9)

    def test_trajectory_50_steps(self, melt_sim):
        sim = melt_sim
        rows = sim.run(50, thermo_every=50)
        row = rows[-1]
        g = GOLDEN[50]
        assert row["temp"] == pytest.approx(g["temp"], rel=2e-5)
        assert row["epair"] == pytest.approx(g["epair"], rel=2e-5)
        assert row["etotal"] == pytest.approx(g["etotal"], rel=1e-6)
        assert row["press"] == pytest.approx(g["press"], rel=1e-4)

    def test_trajectory_250_steps(self, melt_sim):
        sim = melt_sim
        # continue from 50 (module fixture ordering) to 250
        assert sim.ntimestep == 50
        rows = sim.run(200, thermo_every=200)
        row = rows[-1]
        assert row["temp"] == pytest.approx(GOLDEN_250["temp"], rel=5e-3)
        assert row["etotal"] == pytest.approx(GOLDEN_250["etotal"], rel=1e-5)
        assert row["press"] == pytest.approx(GOLDEN_250["press"], rel=2e-2)

    def test_energy_conservation(self):
        # NVE conservation in fp64 with a conservative rebuild policy and an
        # energy-SHIFTED potential. (Plain truncated LJ drifts by E(rc) per
        # cutoff crossing — in the reference too: its own melt golden log
        # drifts -0.0067/atom over 250 steps. With the shift the only
        # residual is the small force discontinuity at rc.)
        from lammps_kokkos_port_tpu.models.pair_lj import make_lj_cut
        from lammps_kokkos_port_tpu.presets import lj_melt_state
        from lammps_kokkos_port_tpu.runner import Simulation

        state = lj_melt_state(cells=6, t_init=1.44, seed=87287, dtype=jnp.float64)
        pair = make_lj_cut(
            1, {(1, 1): (1.0, 1.0)}, 2.5, shift=True, dtype=jnp.float64
        )
        sim = Simulation(
            state, pair, dt=0.005, skin=0.3, neigh_every=1, neigh_check=True
        )
        sim.setup()
        rows = sim.run(200, thermo_every=200)
        e0, e1 = rows[0]["etotal"], rows[-1]["etotal"]
        assert abs(e1 - e0) < 3e-4  # per-atom drift over 200 steps (fp64)
