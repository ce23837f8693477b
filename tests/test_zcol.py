"""z-column (zcol) layout parity vs the matrix engine.

The zcol mode (ops/zcolforce + ops/pallas_zcol) stores the state compacted
and z-sorted per xy-column and evaluates pair forces over contiguous
candidate row windows. With every-step rebuilds both engines see identical
pair sets, so trajectories must agree to roundoff (same contract as the
cell-dense parity test in test_lj_melt.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.presets import lj_melt_sim


def _traj(mode, every, steps=20):
    sim = lj_melt_sim(cells=6, t_init=1.44, dtype=jnp.float64,
                      every=every, delay=0, check=False, list_mode=mode)
    sim.setup()
    rows = sim.run(steps)
    x = np.asarray(sim.state.x)
    valid = np.asarray(sim.state.valid_mask)
    tag = np.asarray(sim.state.tag)
    order = np.argsort(tag[valid])
    return x[valid][order], rows[-1]["etotal"]


@pytest.mark.parametrize(
    "every",
    [1, pytest.param(5, marks=pytest.mark.slow)])
def test_zcol_matches_matrix(every):
    xm, em = _traj("matrix", every)
    xz, ez = _traj("zcol", every)
    np.testing.assert_allclose(xz, xm, atol=1e-11)
    assert ez == pytest.approx(em, rel=1e-12)


def test_zcol_force_parity_step0():
    """Fresh-list force parity: zcol force pass vs the matrix engine on
    the same (tag-matched) configuration."""
    from lammps_kokkos_port_tpu.ops import zcolforce

    sims = {}
    for mode in ("matrix", "zcol"):
        sim = lj_melt_sim(cells=6, t_init=1.44, dtype=jnp.float64,
                          every=1, delay=0, check=False, list_mode=mode)
        sim.setup()
        sims[mode] = sim

    def by_tag(sim):
        valid = np.asarray(sim.state.valid_mask)
        tag = np.asarray(sim.state.tag)[valid]
        f = np.asarray(sim.state.f)[valid]
        return f[np.argsort(tag)]

    fm = by_tag(sims["matrix"])
    fz = by_tag(sims["zcol"])
    np.testing.assert_allclose(fz, fm, atol=1e-10)
    assert isinstance(sims["zcol"].nl, zcolforce.ZColCells)
