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


NH_DECK = """
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
{fixes}
timestep        1.0
run             {steps}
"""


def _nh_script(data, steps, R, fixes):
    s = LammpsScript(dtype=jnp.float64)
    deck = NH_DECK.format(data=data, steps=steps, R=R, fixes=fixes)
    for ln in deck.strip().splitlines():
        s.one(ln)
    return s


class TestShardedNoseHoover:
    """NVT / NPT (+SHAKE, +PPPM) inside the sharded molecular loop
    (VERDICT r3 item 5: sharded rhodo stack; ref: fix_nh.cpp remap +
    kspace setup across ranks, fix_shake.cpp comm of xshake)."""

    def _run_pair(self, water_data, fixes, nsteps=12, R=4, ndev=8):
        from lammps_kokkos_port_tpu.integrate.shake import FixShakeClusters
        from lammps_kokkos_port_tpu.parallel.molecular import (
            ShardedMolecularMD)

        # reference protocol: `run 0` (setup: force at the raw coords,
        # THEN the SHAKE coordinate projection) followed by `run N` — the
        # sharded runner starts from the post-`run 0` state, so both sides
        # must enter the N steps from the same projected state
        ref = _nh_script(water_data, 0, R, fixes)
        ref.one(f"run {nsteps}")
        tags_ref, x_ref = _by_tag(ref.sim.state)
        frac_ref = _wrap_frac(ref.sim.state.box, x_ref)
        prd_ref = np.asarray(jax.device_get(ref.sim.state.box.prd))

        s0 = _nh_script(water_data, 0, R, fixes)
        shk = next((f for f in s0.sim.fixes
                    if isinstance(f, FixShakeClusters)), None)
        mesh = Mesh(np.array(jax.devices()[:ndev]), ("x",))
        smd = ShardedMolecularMD(
            s0.sim.state, s0.sim.forcefield, mesh=mesh, rebuild_every=R,
            integrator=s0.sim.integrator, shake=shk)
        smd.run(nsteps)
        g = smd.gather()
        np.testing.assert_array_equal(g["tag"], tags_ref)
        prd = np.asarray(jax.device_get(g["box"].prd))
        # Tolerance calibration (r5, benchmarks/prof/repro_npt_shard.py +
        # /tmp bisects): the sharded-vs-single box edge is BIT-EXACT after
        # step 1 and then diverges by reduction-order roundoff amplified
        # ~x2/step through the chaotic dynamics + barostat feedback
        # (box rel diff: step2 2.2e-11 -> step12 1.4e-8). Per-atom
        # positions diverge faster (frac diff: step2 3.8e-8 -> step12
        # 2.6e-5): the per-atom deltas are GLOBALLY CANCELLING (the box,
        # which integrates the summed virial, stays at reduction-order
        # level) and appear IDENTICALLY with kspace removed and with
        # SHAKE removed — i.e. not a force-stack systematic; a real
        # virial/force bug would move the box ~1e-6, 5 orders above what
        # is observed. Pinned at the measured 12-step points with ~5x
        # margin.
        np.testing.assert_allclose(prd, prd_ref, rtol=1e-7)
        frac = _wrap_frac(g["box"], g["x"])
        d = np.abs(frac - frac_ref)
        d = np.minimum(d, 1.0 - d)
        assert d.max() < 1e-4, d.max()
        return smd

    def test_nvt_8_shards(self, water_data):
        self._run_pair(water_data,
                       "fix             1 all nvt temp 300.0 300.0 100.0")

    def test_npt_shake_pppm_8_shards(self, water_data):
        """The full rhodo-stack combination: NPT box remap + SHAKE
        clusters + in-step PPPM with a dynamic (box-traced) influence
        function, sharded over 8 slabs."""
        smd = self._run_pair(
            water_data,
            "fix             1 all npt temp 300.0 300.0 100.0 "
            "iso 0.0 0.0 1000.0\n"
            "fix             2 all shake 1e-10 100 0 b 1 a 1")
        # the box must actually have moved (the barostat is live)
        prd0 = np.asarray(jax.device_get(smd.global_state.box.prd))
        prd1 = np.asarray(jax.device_get(smd.box.prd))
        assert np.abs(prd1 - prd0).max() > 0.0
