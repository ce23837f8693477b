"""Bisect the sharded-NPT box divergence by step count.

Runs the test_npt_shake_pppm_8_shards configuration for nsteps in
{1, 2, 4, 8, 12} and prints |prd_sharded - prd_ref| to see whether the
divergence is a step-1 systematic (virial bug) or roundoff growth.

Run: PYTHONPATH=/root/repo python -u benchmarks/prof/repro_npt_shard.py
"""
import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", "..", "benchmarks"))

from make_rhodo_water import write_data  # noqa: E402

from lammps_kokkos_port_tpu.script import LammpsScript  # noqa: E402
from lammps_kokkos_port_tpu.integrate.shake import FixShakeClusters  # noqa: E402
from lammps_kokkos_port_tpu.parallel.molecular import ShardedMolecularMD  # noqa: E402

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
fix             1 all npt temp 300.0 300.0 100.0 iso 0.0 0.0 1000.0
fix             2 all shake 1e-10 100 0 b 1 a 1
timestep        1.0
run             {steps}
"""

FIXES = None


def _script(data, steps, R):
    s = LammpsScript(dtype=jnp.float64)
    for ln in NH_DECK.format(data=data, steps=steps, R=R).strip().splitlines():
        s.one(ln)
    return s


td = tempfile.mkdtemp()
data = os.path.join(td, "data.water")
write_data(data, nside=(20, 5, 5))
R = 4

for nsteps in (1, 2, 4, 8, 12):
    ref = _script(data, 0, R)
    ref.one(f"run {nsteps}")
    prd_ref = np.asarray(jax.device_get(ref.sim.state.box.prd))

    s0 = _script(data, 0, R)
    shk = next((f for f in s0.sim.fixes
                if isinstance(f, FixShakeClusters)), None)
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    smd = ShardedMolecularMD(
        s0.sim.state, s0.sim.forcefield, mesh=mesh, rebuild_every=R,
        integrator=s0.sim.integrator, shake=shk)
    smd.run(nsteps)
    prd = np.asarray(jax.device_get(smd.box.prd))
    rel = np.abs(prd - prd_ref) / prd_ref
    import sys as _s
    _s.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "..", "tests"))
    def by_tag(state):
        valid = np.asarray(jax.device_get(state.valid_mask))
        tag = np.asarray(state.tag)[valid]
        order = np.argsort(tag)
        return np.asarray(state.x)[valid][order]
    x_ref2 = by_tag(ref.sim.state)
    lam_r = np.asarray(ref.sim.state.box.to_lamda(jnp.asarray(x_ref2)))
    lam_r = lam_r - np.floor(lam_r)
    g = smd.gather()
    tags = g["tag"]
    order = np.argsort(tags)
    lam_s = np.asarray(g["box"].to_lamda(jnp.asarray(g["x"][order])))
    lam_s = lam_s - np.floor(lam_s)
    d = np.abs(lam_s - lam_r)
    d = np.minimum(d, 1 - d)
    print(f"nsteps={nsteps:3d}  rel prd diff = {rel[0]:.3e}  "
          f"frac diff max = {d.max():.3e}", file=sys.stderr, flush=True)
