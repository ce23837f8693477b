"""ShardedMolecularMD vs single-chip: bonded + special + PPPM in the
sharded slab loop (VERDICT r2 item 5b; ref: rhodo runs on any rank count,
src/comm_brick.cpp + src/grid3d.cpp + src/ntopo_bond_all.cpp).

An elongated water box (20x5x5 TIP3P molecules, 1500 atoms) shards into 8
x-slabs; the full force stack — lj/cut/coul/long with CHARMM special
weights, harmonic bonds, charmm angles, PPPM — must reproduce the
single-chip trajectory to accumulation-order roundoff."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

from lammps_kokkos_port_tpu.script import LammpsScript

DECK = """
units           real
neigh_modify    every {R} delay 0 check no
atom_style      full
bond_style      harmonic
angle_style     charmm
pair_style      lj/cut/coul/long 5.0
kspace_style    pppm 1e-4
read_data       {data}
special_bonds   charmm
velocity        all create 300.0 482648 loop geom
fix             1 all nve
timestep        1.0
run             {steps}
"""


def _script(data, steps, R):
    s = LammpsScript(dtype=jnp.float64)
    for ln in DECK.format(data=data, steps=steps, R=R).strip().splitlines():
        s.one(ln)
    return s


def _by_tag(state):
    valid = np.asarray(jax.device_get(state.valid_mask))
    tag = np.asarray(state.tag)[valid]
    order = np.argsort(tag)
    return tag[order], np.asarray(state.x)[valid][order]


def _wrap_frac(box, x):
    lam = np.asarray(box.to_lamda(jnp.asarray(x)))
    return lam - np.floor(lam)


@pytest.fixture(scope="module")
def water_data(tmp_path_factory):
    from make_rhodo_water import write_data

    path = str(tmp_path_factory.mktemp("smol") / "data.water")
    write_data(path, nside=(20, 5, 5))
    return path


class TestShardedMolecular:
    def test_8_shards_match_single_chip(self, water_data):
        from lammps_kokkos_port_tpu.parallel.molecular import (
            ShardedMolecularMD)

        nsteps, R = 12, 4
        ref = _script(water_data, nsteps, R)
        tags_ref, x_ref = _by_tag(ref.sim.state)
        frac_ref = _wrap_frac(ref.sim.state.box, x_ref)

        s0 = _script(water_data, 0, R)
        state0, ff = s0.sim.state, s0.sim.forcefield
        mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
        smd = ShardedMolecularMD(state0, ff, mesh=mesh,
                                 rebuild_every=R, dt=1.0)
        smd.run(nsteps)
        g = smd.gather()
        assert len(g["tag"]) == len(tags_ref)
        np.testing.assert_array_equal(g["tag"], tags_ref)
        frac = _wrap_frac(state0.box, g["x"])
        d = np.abs(frac - frac_ref)
        d = np.minimum(d, 1.0 - d)
        assert d.max() < 1e-9, d.max()

    def test_bonded_only_2_shards(self, water_data):
        """No kspace/coulomb: isolates the tag-map topology re-indexing."""
        from lammps_kokkos_port_tpu.parallel.molecular import (
            ShardedMolecularMD)

        deck = DECK.replace("pair_style      lj/cut/coul/long 5.0",
                            "pair_style      lj/cut 5.0")
        deck = deck.replace("kspace_style    pppm 1e-4\n", "")
        deck = deck.replace("special_bonds   charmm",
                            "special_bonds   lj/coul 0.0 0.0 0.0")

        def script(steps, R):
            s = LammpsScript(dtype=jnp.float64)
            for ln in deck.format(data=water_data, steps=steps,
                                  R=R).strip().splitlines():
                s.one(ln)
            return s

        nsteps, R = 10, 5
        ref = script(nsteps, R)
        tags_ref, x_ref = _by_tag(ref.sim.state)
        frac_ref = _wrap_frac(ref.sim.state.box, x_ref)

        s0 = script(0, R)
        mesh = Mesh(np.array(jax.devices()[:2]), ("x",))
        smd = ShardedMolecularMD(s0.sim.state, s0.sim.forcefield,
                                 mesh=mesh, rebuild_every=R, dt=1.0)
        smd.run(nsteps)
        g = smd.gather()
        np.testing.assert_array_equal(g["tag"], tags_ref)
        frac = _wrap_frac(s0.sim.state.box, g["x"])
        d = np.abs(frac - frac_ref)
        d = np.minimum(d, 1.0 - d)
        assert d.max() < 1e-9, d.max()
