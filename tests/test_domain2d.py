"""2-D (x, y) domain decomposition: sharded trajectories must equal the
single-chip trajectories to roundoff, including migration across both
axes and corner-ghost forwarding (ref: src/comm.cpp:534-629 procgrid;
src/comm_brick.cpp per-dim exchange/border loops)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lammps_kokkos_port_tpu.core.state import atom_order
from lammps_kokkos_port_tpu.models.forcefield import from_pair
from lammps_kokkos_port_tpu.parallel.domain2d import ShardedMD2D
from lammps_kokkos_port_tpu.presets import lj_melt_pair, lj_melt_state
from lammps_kokkos_port_tpu.runner import Simulation


def wrap_lamda(box, x):
    lam = np.asarray(box.to_lamda(jnp.asarray(x))).copy()
    return lam - np.floor(lam)


def run_both(shape, cells, nsteps, R, t_init=1.44, integrator="nve",
             t_target=None, t_period=None):
    state = lj_melt_state(cells=cells, t_init=t_init, dtype=jnp.float64)
    pair = lj_melt_pair(dtype=jnp.float64)
    n = int(state.nlocal)

    sim = Simulation(state, pair, skin=0.3, neigh_every=R, neigh_delay=0,
                     neigh_check=False)
    if integrator == "nvt":
        from lammps_kokkos_port_tpu.integrate.nh import FixNVT

        sim.integrator = FixNVT(dt=sim.dt, units=sim.units,
                                t_start=t_target, t_stop=t_target,
                                t_period=t_period)
    sim.setup()
    sim.run(nsteps)
    rows = atom_order(sim.state)
    tags = np.asarray(sim.state.tag)[rows]
    ref = wrap_lamda(sim.state.box, np.asarray(sim.state.x)[rows])

    devs = np.array(jax.devices()[:shape[0] * shape[1]]).reshape(shape)
    mesh = Mesh(devs, ("x", "y"))
    smd = ShardedMD2D(state, from_pair(pair), mesh=mesh, skin=0.3,
                      rebuild_every=R, integrator=integrator,
                      t_target=t_target, t_period=t_period)
    smd.run(nsteps)
    g = smd.gather()
    assert len(g["tag"]) == n
    np.testing.assert_array_equal(g["tag"], tags)
    got = wrap_lamda(state.box, g["x"])
    d = np.abs(ref - got)
    d = np.minimum(d, 1.0 - d)
    return d.max()


class TestSharded2D:
    def test_2x4_match_single_chip(self):
        assert run_both((2, 4), cells=10, nsteps=30, R=10) < 1e-12

    def test_4x2_migration_hot(self):
        # hot melt, multiple rebuild cycles -> migration across BOTH axes
        assert run_both((4, 2), cells=10, nsteps=40, R=5,
                        t_init=3.0) < 1e-11

    def test_2x2_corner_ghosts(self):
        # 4 shards: every pair interaction crossing a corner must arrive
        # through the dim-sequential ghost forwarding
        assert run_both((2, 2), cells=10, nsteps=20, R=10) < 1e-12

    def test_nvt_2x4(self):
        assert run_both((2, 4), cells=10, nsteps=24, R=8,
                        integrator="nvt", t_target=1.2,
                        t_period=0.5) < 1e-11
