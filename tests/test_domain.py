"""Spatial domain decomposition tests: sharded trajectories must equal
single-chip trajectories to roundoff (forces from complete lists are
identical regardless of where the list was built)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lammps_kokkos_port_tpu.models.forcefield import from_pair
from lammps_kokkos_port_tpu.parallel.domain import ShardedMD
from lammps_kokkos_port_tpu.presets import lj_melt_pair, lj_melt_state
from lammps_kokkos_port_tpu.runner import Simulation


def wrap_lamda(box, x):
    lam = np.asarray(box.to_lamda(jnp.asarray(x))).copy()
    return lam - np.floor(lam)


def run_pair_both_ways(ndev, cells, nsteps, R, t_init=1.44):
    state = lj_melt_state(cells=cells, t_init=t_init, dtype=jnp.float64)
    pair = lj_melt_pair(dtype=jnp.float64)
    n = int(state.nlocal)

    sim = Simulation(state, pair, skin=0.3, neigh_every=R, neigh_delay=0,
                     neigh_check=False)
    sim.setup()
    sim.run(nsteps)
    tags = np.asarray(sim.state.tag)[:n]
    order = np.argsort(tags)
    ref = wrap_lamda(sim.state.box, np.asarray(sim.state.x)[:n][order])

    mesh = Mesh(np.array(jax.devices()[:ndev]), ("x",))
    smd = ShardedMD(state, from_pair(pair), mesh=mesh, skin=0.3,
                    rebuild_every=R)
    smd.run(nsteps)
    g = smd.gather()
    got = wrap_lamda(state.box, g["x"])
    assert len(g["tag"]) == n  # no atoms lost through migration
    np.testing.assert_array_equal(g["tag"], tags[order])
    d = np.abs(ref - got)
    d = np.minimum(d, 1.0 - d)  # periodic distance in fractional coords
    return d.max()


class TestShardedLJ:
    def test_4_shards_match_single_chip(self):
        dmax = run_pair_both_ways(ndev=4, cells=10, nsteps=30, R=10)
        assert dmax < 1e-12

    def test_2_shards_longer_run_with_migration(self):
        # hot system, many rebuild cycles -> atoms migrate between slabs
        dmax = run_pair_both_ways(ndev=2, cells=8, nsteps=60, R=5,
                                  t_init=3.0)
        assert dmax < 1e-11

    def test_8_shards_elongated_box(self):
        state = lj_melt_state(cells=(16, 3, 3), t_init=1.44,
                              dtype=jnp.float64)
        pair = lj_melt_pair(dtype=jnp.float64)
        n = int(state.nlocal)
        mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
        smd = ShardedMD(state, from_pair(pair), mesh=mesh, skin=0.3,
                        rebuild_every=5)
        smd.run(20)
        g = smd.gather()
        assert len(g["tag"]) == n
        assert np.isfinite(g["x"]).all()
