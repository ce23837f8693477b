"""bench/in.rhodo-shaped deck end-to-end through the interpreter:
read_data (with coeff sections) + lj/charmm/coul/long + PPPM + CHARMM
bonded + `fix shake` + `fix npt z ... mtk no pchain 0 tchain 1` — the full
rhodopsin style stack (ref: bench/in.rhodo; its data file is stripped from
the mirror, so benchmarks/make_rhodo_water.py synthesizes the system)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

from lammps_kokkos_port_tpu.script import LammpsScript

DECK = """
units           real
neigh_modify    delay 5 every 1
atom_style      full
bond_style      harmonic
angle_style     charmm
pair_style      lj/charmm/coul/long 8.0 10.0
pair_modify     mix arithmetic
kspace_style    pppm 1e-4
read_data       {data}
fix             1 all shake 0.0001 5 0 b 1 a 1
fix             2 all npt temp 300.0 300.0 100.0 z 0.0 0.0 1000.0 mtk no pchain 0 tchain 1
special_bonds   charmm
velocity        all create 300.0 482648 loop geom
thermo          5
timestep        2.0
run             5
"""


def test_rhodo_water_deck(tmp_path):
    from make_rhodo_water import write_data

    data = str(tmp_path / "data.rhodo-water")
    natoms, L = write_data(data, nside=7)  # 1029 atoms, box > 2*cutoff
    assert natoms == 1029

    s = LammpsScript(dtype=jnp.float64)
    for ln in DECK.format(data=data).strip().splitlines():
        s.one(ln)

    sim = s.sim
    st = sim.state
    # SHAKE holds every O-H bond and H-O-H 1-3 distance at its target
    shake = [f for f in sim.fixes if hasattr(f, "max_violation")]
    assert len(shake) == 1
    viol = float(jax.device_get(shake[0].max_violation(st)))
    # constraints hold to the deck's own SHAKE tolerance (0.0001, 5 iters)
    # — the reference solver iterates to |dlamda| <= tol, not machine eps
    assert viol < 5e-4, viol
    # all bonds/angles are constrained -> no bonded force terms remain
    row = sim.thermo()
    assert row["emol"] == 0.0
    assert np.isfinite(row["etotal"]) and np.isfinite(row["press"])
    # constraint DOF accounting: 3 constraints per molecule
    assert sim.fix_dof() == 3 * (natoms // 3)


MIX_DECK = """
units           real
neigh_modify    delay 5 every 1
atom_style      full
bond_style      harmonic
angle_style     charmm
dihedral_style  charmm
improper_style  harmonic
pair_style      lj/charmm/coul/long 8.0 10.0
pair_modify     mix arithmetic
kspace_style    pppm 1e-4
read_data       {data}
fix             1 all shake 0.0001 5 0 m 1.0 a 1
fix             2 all npt temp 300.0 300.0 100.0 z 0.0 0.0 1000.0 mtk no pchain 0 tchain 1
special_bonds   charmm
velocity        all create 300.0 482648 loop geom
thermo          5
timestep        2.0
run             5
"""


def test_rhodo_mix_deck(tmp_path):
    """The rhodo-CLASS benchmark system (water + CH2 chains): the FULL
    bench/in.rhodo stack — dihedral charmm (with 1-4 LJ/coul through the
    pair style's eps14), improper harmonic, mass-based SHAKE (m 1.0
    constrains every X-H bond; water angles via a 1), NPT-z, PPPM
    (ref: bench/in.rhodo:8-17; term ratios from
    log.6Oct16.rhodo.fixed.icc.1)."""
    from make_rhodo_mix import write_data

    data = str(tmp_path / "data.rhodo-mix")
    n, nb, na, nd, ni, L = write_data(data, nwater=120, nchain=12, nc=8)
    assert nd > 0 and ni > 0

    s = LammpsScript(dtype=jnp.float64)
    for ln in MIX_DECK.format(data=data).strip().splitlines():
        s.one(ln)
    sim = s.sim
    st = sim.state
    shake = [f for f in sim.fixes if hasattr(f, "max_violation")]
    assert len(shake) == 1
    viol = float(jax.device_get(shake[0].max_violation(st)))
    assert viol < 5e-4, viol
    row = sim.thermo()
    # dihedrals/impropers/unconstrained angles leave REAL bonded forces
    assert row["emol"] != 0.0
    assert np.isfinite(row["etotal"]) and np.isfinite(row["press"])
    # every X-H bond is SHAKE-constrained by the m 1.0 rule: 2 per water
    # + 2 per CH2, plus one angle constraint per water
    nwater, nch, nc = 120, 12, 8
    expected = 2 * nwater + nwater + 2 * nc * nch
    assert sim.fix_dof() == expected
