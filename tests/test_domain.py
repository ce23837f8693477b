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
from lammps_kokkos_port_tpu.core.state import atom_order
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
    rows = atom_order(sim.state)  # tag-sorted, layout-agnostic
    tags = np.asarray(sim.state.tag)[rows]
    ref = wrap_lamda(sim.state.box, np.asarray(sim.state.x)[rows])

    mesh = Mesh(np.array(jax.devices()[:ndev]), ("x",))
    smd = ShardedMD(state, from_pair(pair), mesh=mesh, skin=0.3,
                    rebuild_every=R)
    smd.run(nsteps)
    g = smd.gather()
    got = wrap_lamda(state.box, g["x"])
    assert len(g["tag"]) == n  # no atoms lost through migration
    np.testing.assert_array_equal(g["tag"], tags)
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

    def test_exact_nsteps_with_remainder(self):
        """run(nsteps) must advance exactly nsteps (trailing partial
        cycle without rebuild)."""
        dmax = run_pair_both_ways(ndev=4, cells=10, nsteps=23, R=10)
        assert dmax < 1e-12


class TestShardedNVT:
    def test_nvt_matches_single_chip(self):
        """Sharded NVT (psum-coupled Nose-Hoover chains) vs the single-chip
        FixNVT trajectory — chain scalars replicated across shards must
        reproduce the exact same dynamics."""
        from lammps_kokkos_port_tpu.integrate.nh import FixNVT
        from lammps_kokkos_port_tpu.utils.units import get_units

        state = lj_melt_state(cells=10, t_init=1.44, dtype=jnp.float64)
        pair = lj_melt_pair(dtype=jnp.float64)
        n = int(state.nlocal)
        units = get_units("lj")
        dt = units.dt

        nvt = FixNVT(dt=dt, units=units, t_start=1.2, t_stop=1.2,
                     t_period=0.5)
        sim = Simulation(state, pair, dt=dt, integrator=nvt, skin=0.3,
                         neigh_every=10, neigh_delay=0, neigh_check=False)
        sim.setup()
        sim.run(30)
        rows = atom_order(sim.state)
        ref_x = wrap_lamda(sim.state.box, np.asarray(sim.state.x)[rows])
        ref_v = np.asarray(sim.state.v)[rows]

        mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
        smd = ShardedMD(state, from_pair(pair), mesh=mesh, skin=0.3,
                        rebuild_every=10, integrator="nvt",
                        t_target=1.2, t_period=0.5)
        smd.run(30)
        g = smd.gather()
        got_x = wrap_lamda(state.box, g["x"])
        d = np.abs(ref_x - got_x)
        d = np.minimum(d, 1.0 - d)
        assert d.max() < 1e-11, d.max()
        np.testing.assert_allclose(g["v"], ref_v, atol=1e-10)


class TestShardedEAM:
    def test_eam_matches_single_chip(self):
        """EAM across shards: the widened halo (ghost_mult=2) must complete
        every ghost's density neighborhood (the analog of the reference's
        mid-compute fp forward comm, ref: pair_eam.cpp:224,251)."""
        from lammps_kokkos_port_tpu.models.pair_eam import make_eam_funcfl

        from lammps_kokkos_port_tpu.core.box import Box
        from lammps_kokkos_port_tpu.core.lattice import Lattice, create_atoms
        from lammps_kokkos_port_tpu.core.state import create_state
        from lammps_kokkos_port_tpu.core.velocity import create_velocities_geom
        from lammps_kokkos_port_tpu.io.eam_reader import read_funcfl
        from lammps_kokkos_port_tpu.utils.units import get_units

        # elongated box: 4 slabs each wider than the DOUBLED ghost cutoff
        pot = "/root/reference/bench/Cu_u3.eam"
        ffu = read_funcfl(pot)
        lat = Lattice(style="fcc", scale=3.615, units_name="metal")
        lo = np.zeros(3)
        hi = np.array([16, 4, 4]) * lat.spacing
        x, types = create_atoms(lat, lo, hi, type_id=1)
        masses = np.array([1.0, ffu.mass])
        v = create_velocities_geom(x, masses[types], 800.0, 376847,
                                   get_units("metal"))
        box = Box.create(lo, hi, dtype=jnp.float64)
        state = create_state(x, box, types=types, velocities=v,
                             masses=masses, units_name="metal",
                             dtype=jnp.float64)
        pair = make_eam_funcfl(ntypes=1, files={1: pot}, dtype=jnp.float64)
        n = int(state.nlocal)

        sim = Simulation(state, pair, dt=0.005, skin=1.0, neigh_every=5,
                         neigh_delay=0, neigh_check=False)
        sim.setup()
        sim.run(15)
        rows = atom_order(sim.state)
        ref = wrap_lamda(sim.state.box, np.asarray(sim.state.x)[rows])

        mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
        smd = ShardedMD(state, from_pair(pair), mesh=mesh, skin=1.0,
                        rebuild_every=5, dt=0.005, ghost_mult=2.0)
        smd.run(15)
        g = smd.gather()
        got = wrap_lamda(state.box, g["x"])
        assert len(g["tag"]) == n
        d = np.abs(ref - got)
        d = np.minimum(d, 1.0 - d)
        assert d.max() < 1e-11, d.max()


class TestShardedThermo:
    def test_thermo_matches_single_chip(self):
        state = lj_melt_state(cells=10, t_init=1.44, dtype=jnp.float64)
        pair = lj_melt_pair(dtype=jnp.float64)
        sim = Simulation(state, pair, skin=0.3, neigh_every=10,
                         neigh_check=False)
        sim.setup()
        sim.run(10)
        ref = sim.thermo()

        mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
        smd = ShardedMD(state, from_pair(pair), mesh=mesh, skin=0.3,
                        rebuild_every=10)
        smd.run(10)
        got = smd.thermo()
        assert got["temp"] == pytest.approx(ref["temp"], rel=1e-10)
        assert got["epair"] == pytest.approx(ref["epair"], rel=1e-10)
        assert got["etotal"] == pytest.approx(ref["etotal"], rel=1e-10)


class TestMultiHopHalo:
    def test_thin_slabs_multihop_matches_single_chip(self):
        """8 shards on a SHORT box: slab width < ghost cutoff, so ghosts
        come from ranks 2-3 hops away via per-hop ppermutes (the ICI form
        of CommBrick multi-swap forwarding, ref comm_brick.cpp:307-310
        maxneed). Trajectory must still equal single-chip to roundoff."""
        state = lj_melt_state(cells=(6, 3, 3), t_init=1.44,
                              dtype=jnp.float64)
        pair = lj_melt_pair(dtype=jnp.float64)
        n = int(state.nlocal)

        sim = Simulation(state, pair, skin=0.3, neigh_every=5,
                         neigh_delay=0, neigh_check=False)
        sim.setup()
        sim.run(20)
        rows = atom_order(sim.state)
        tags = np.asarray(sim.state.tag)[rows]
        ref = wrap_lamda(sim.state.box, np.asarray(sim.state.x)[rows])

        mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
        smd = ShardedMD(state, from_pair(pair), mesh=mesh, skin=0.3,
                        rebuild_every=5)
        assert smd.nhop >= 2  # the thin-slab case actually multi-hops
        smd.run(20)
        g = smd.gather()
        assert len(g["tag"]) == n
        np.testing.assert_array_equal(g["tag"], tags)
        got = wrap_lamda(state.box, g["x"])
        d = np.abs(ref - got)
        d = np.minimum(d, 1.0 - d)
        assert d.max() < 1e-12
