"""Distributed PPPM: the charge grid + FFT sharded over an 8-device mesh
via GSPMD sharding constraints — the TPU-native analog of the reference's
Grid3d ghost comm + remap_3d FFT pencil transposes (ref:
src/KSPACE/remap.cpp:63, src/KOKKOS/grid3d_kokkos.cpp; SURVEY.md §2.12.6).
XLA inserts the all-to-alls the reference hand-codes; this test pins
numerical equality with the single-device solve."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from test_kspace import nacl_state, random_salt_state

from lammps_kokkos_port_tpu.models.pppm import PPPM


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("gx",))


class TestShardedPPPM:
    def test_matches_single_device(self):
        """Sharded-grid PPPM forces/energy == single-device to fp64
        roundoff; the jitted module runs with atoms AND grid distributed."""
        state = nacl_state(cells=2)  # 64 atoms, 4^3 box
        mesh = _mesh()
        g = 0.8
        ref = PPPM.create(state.box, g_ewald=g, grid=(16, 16, 16), order=5)
        f0, e0, _ = jax.jit(
            lambda s: ref.compute(s, True, False))(state)

        shard = NamedSharding(mesh, P("gx", None, None))
        pp = dataclasses.replace(ref, grid_sharding=shard)

        # distribute the per-atom arrays over the mesh axis too
        atom_sh = NamedSharding(mesh, P("gx"))
        atom_sh2 = NamedSharding(mesh, P("gx", None))
        state_d = state.replace(
            x=jax.device_put(state.x, atom_sh2),
            q=jax.device_put(state.q, atom_sh),
        )
        f1, e1, _ = jax.jit(lambda s: pp.compute(s, True, False))(state_d)

        assert float(e1) == pytest.approx(float(e0), rel=1e-12)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                                   atol=1e-11)

    def test_grid_actually_sharded(self):
        """The constrained rho grid lands distributed: each device holds
        a 1/8 slab of the leading axis."""
        state = random_salt_state(n=48, L=8.0)
        mesh = _mesh()
        shard = NamedSharding(mesh, P("gx", None, None))
        pp = PPPM.create(state.box, g_ewald=0.9, grid=(16, 16, 16),
                         order=5)
        pp = dataclasses.replace(pp, grid_sharding=shard)

        spread = jax.jit(lambda s: pp._spread(s.x, s))
        rho = spread(state)
        assert rho.sharding.is_equivalent_to(shard, rho.ndim)
        # every charge landed on the grid exactly once
        np.testing.assert_allclose(float(jnp.sum(rho)),
                                   float(jnp.sum(state.q)), atol=1e-10)
