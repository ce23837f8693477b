"""zwin (quantile-column z-window) engine vs the matrix engine.

Parity of forces/energy/virial on a melt configuration, trajectory
parity over a multi-rebuild run, and the overflow-grow path
(ref physics baseline: the [N,K] matrix engine, itself pinned against
the reference's golden logs in test_lj_melt.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.ops import zwin
from lammps_kokkos_port_tpu.presets import lj_melt_sim


def _by_tag(state, arr):
    valid = np.asarray(jax.device_get(state.valid_mask))
    tags = np.asarray(jax.device_get(state.tag))[valid]
    order = np.argsort(tags)
    return np.asarray(jax.device_get(arr))[valid][order]


def make_pair(mode, nsteps=0, cells=6, dtype=jnp.float64):
    sim = lj_melt_sim(cells=cells, t_init=1.44, seed=87287, dtype=dtype,
                      every=5, delay=0, check=False)
    sim._list_mode_req = mode
    sim.setup()
    if nsteps:
        sim._run_segment_retry(nsteps)
    return sim


class TestZwinParity:
    def test_params_sizing(self):
        sim = make_pair("matrix")
        p = zwin.size_for_system(sim.state, cutneigh=2.8, skin=0.3)
        assert p is not None
        assert p.nx >= 3 and p.ny >= 3
        assert p.WS % 8 == 0 and p.WN % 8 == 0 and p.OFF % 8 == 0
        assert p.G >= p.OFF and p.G >= p.WN - p.OFF - 8

    def test_forces_match_matrix(self):
        ref = make_pair("matrix")
        zw = make_pair("zwin")
        assert not bool(jax.device_get(zw.nl.overflow))
        f_ref = _by_tag(ref.state, ref.state.f)
        f_zw = _by_tag(zw.state, zw.state.f)
        np.testing.assert_allclose(f_zw, f_ref, rtol=1e-10, atol=1e-11)

    def test_energy_virial_match(self):
        ref = make_pair("matrix")
        zw = make_pair("zwin")
        tr = ref.thermo()
        tz = zw.thermo()
        for k in ("temp", "pe", "press", "etotal"):
            assert tz[k] == pytest.approx(tr[k], rel=1e-11, abs=1e-12), k

    def test_trajectory_parity(self):
        # 25 steps crosses 5 rebuilds (every=5) — full re-partition path
        ref = make_pair("matrix", nsteps=25)
        zw = make_pair("zwin", nsteps=25)
        assert not bool(jax.device_get(zw.nl.overflow))
        x_ref = _by_tag(ref.state, ref.state.x)
        x_zw = _by_tag(zw.state, zw.state.x)
        # both wrapped; compare minimum-image displacement
        prd = np.asarray(jax.device_get(ref.state.box.prd))
        d = x_zw - x_ref
        d -= prd * np.round(d / prd)
        assert np.abs(d).max() < 1e-8, np.abs(d).max()
        v_ref = _by_tag(ref.state, ref.state.v)
        v_zw = _by_tag(zw.state, zw.state.v)
        np.testing.assert_allclose(v_zw, v_ref, rtol=1e-7, atol=1e-9)

    def test_overflow_grow_heals(self):
        # undersized windows must flag overflow at build and heal through
        # the runner's grow-retry loop, not corrupt physics
        zw = make_pair("zwin")
        p0 = zw.nl.params
        small = dataclasses.replace(
            p0, WN=16, OFF=8, G=max(p0.G, 8), WS=16)
        zw._zwin_params = small
        zw.nl = zw._build_list(zw.state, small)
        assert bool(jax.device_get(zw.nl.overflow))
        zw._check_overflow_and_grow(max_tries=20)
        assert not bool(jax.device_get(zw.nl.overflow))
        ref = make_pair("matrix")
        zw.presetup_forces()
        f_ref = _by_tag(ref.state, ref.state.f)
        f_zw = _by_tag(zw.state, zw.state.f)
        np.testing.assert_allclose(f_zw, f_ref, rtol=1e-9, atol=1e-10)

    def test_drift_guard_rebuilds(self):
        # check=True path: displacement beyond half skin triggers rebuild
        sim = lj_melt_sim(cells=6, t_init=1.44, seed=87287,
                          dtype=jnp.float64, every=1, delay=0, check=True)
        sim._list_mode_req = "zwin"
        sim.setup()
        n0 = int(jax.device_get(sim.nl.nbuilds))
        sim._run_segment_retry(20)
        assert int(jax.device_get(sim.nl.nbuilds)) > n0
