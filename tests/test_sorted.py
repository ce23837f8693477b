"""Sorted (cell-major) layout parity vs the matrix engine.

The sorted mode (ops/sortedforce + ops/pallas_pair) keeps the state in
cell-major order and evaluates pair forces with the Pallas column/plane
kernels (interpret mode on CPU). With every-step rebuilds both engines see
identical pair sets, so trajectories must agree to roundoff — the same
contract as test_zcol.py / the cell-dense parity test in test_lj_melt.py.

The big-N plane kernels (plane_force_pallas / plane_half_force_pallas)
normally trigger only above _VMEM_ROW_LIMIT rows; here the limit is
monkeypatched to 0 so the streaming kernels run on a small CPU-sized
system (ref hot path analog: src/KOKKOS/pair_kokkos.h:53-185).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.ops import pallas_pair
from lammps_kokkos_port_tpu.presets import lj_melt_sim


def _traj(mode, every=1, steps=20, cells=6):
    sim = lj_melt_sim(cells=cells, t_init=1.44, dtype=jnp.float64,
                      every=every, delay=0, check=False, list_mode=mode)
    sim.setup()
    rows = sim.run(steps)
    x = np.asarray(sim.state.x)
    valid = np.asarray(sim.state.valid_mask)
    tag = np.asarray(sim.state.tag)
    order = np.argsort(tag[valid])
    return x[valid][order], rows[-1]["etotal"]


def _forces_by_tag(sim):
    valid = np.asarray(sim.state.valid_mask)
    tag = np.asarray(sim.state.tag)[valid]
    f = np.asarray(sim.state.f)[valid]
    return f[np.argsort(tag)]


def test_sorted_matches_matrix():
    """Column-half kernel + fused NVE segment trajectory parity."""
    xm, em = _traj("matrix")
    xs, es = _traj("sorted")
    np.testing.assert_allclose(xs, xm, atol=1e-11)
    assert es == pytest.approx(em, rel=1e-12)


def test_sorted_rebuild_cadence_matches_matrix():
    """every=5 exercises the fused runner's static rebuild schedule
    (integrate/fused.py runner_static) across plain/rebuild blocks."""
    xm, em = _traj("matrix", every=5, steps=11)
    xs, es = _traj("sorted", every=5, steps=11)
    np.testing.assert_allclose(xs, xm, atol=1e-11)
    assert es == pytest.approx(em, rel=1e-12)


@pytest.mark.parametrize("half", [True, False])
def test_plane_kernel_force_parity(monkeypatch, half):
    """Big-N streaming kernels vs the matrix engine at step 0. The
    Newton-halved variant (plane_half_force_pallas) carries dx=+1
    reactions through the rolling `pending` accumulator across planes;
    the full variant revisits each plane's 27-stencil."""
    monkeypatch.setattr(pallas_pair, "_VMEM_ROW_LIMIT", 0)
    if not half:
        monkeypatch.setattr(pallas_pair, "plane_half_fits", lambda p: False)

    sims = {}
    for mode in ("matrix", "sorted"):
        sim = lj_melt_sim(cells=6, t_init=1.44, dtype=jnp.float64,
                          every=1, delay=0, check=False, list_mode=mode)
        sim.setup()
        sims[mode] = sim
    p = sims["sorted"].nl.params
    assert p.ncells[0] >= 3  # plane kernels need >= 3 x-planes
    fm = _forces_by_tag(sims["matrix"])
    fs = _forces_by_tag(sims["sorted"])
    np.testing.assert_allclose(fs, fm, atol=1e-10)


def test_plane_half_trajectory(monkeypatch):
    """Multi-step trajectory through the plane-half kernel, including the
    x-wrap pending fold and rebuild re-binning."""
    monkeypatch.setattr(pallas_pair, "_VMEM_ROW_LIMIT", 0)
    xm, em = _traj("matrix", every=2, steps=6)
    xs, es = _traj("sorted", every=2, steps=6)
    np.testing.assert_allclose(xs, xm, atol=1e-11)
    assert es == pytest.approx(em, rel=1e-12)
