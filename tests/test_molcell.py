"""Dense molecular cell engine (ops/molcell) vs the [N,K] matrix engine.

The molcell path evaluates charged + special-bond pair styles over dense
sub-cutoff cell blocks with no per-pair gathers (the TPU-native layout;
see ops/molcell docstring). Full candidate sets make it numerically the
same sum as the matrix engine up to fp addition order, so forces must
match to roundoff and trajectories to accumulation noise.
"""

import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))


def _water_script(list_mode, nside=10, run=0):
    from make_rhodo_water import write_data

    from lammps_kokkos_port_tpu.script import LammpsScript

    deck = """
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
fix             2 all nvt temp 300.0 300.0 100.0
special_bonds   charmm
velocity        all create 300.0 482648 loop geom
timestep        2.0
run             {run}
"""
    with tempfile.TemporaryDirectory() as td:
        data = os.path.join(td, "data.water")
        write_data(data, nside=nside)
        s = LammpsScript(dtype=jnp.float64, list_mode=list_mode)
        for ln in deck.format(data=data, run=run).strip().splitlines():
            s.one(ln)
    return s


class TestMolCellParity:
    def test_forces_match_matrix(self):
        s = _water_script("matrix")
        sim = s.sim
        ff = sim.forcefield
        f_ref, ev, ec, vir = ff.pair.compute_detailed(
            sim.state, sim.nl, True, True,
            special_lj=ff.special.weights_lj,
            special_coul=ff.special.weights_coul)

        from lammps_kokkos_port_tpu.ops import molcell

        p = molcell.size_for_system(sim.state, sim.nl.params.cutneigh,
                                    sim.nl.params.skin)
        assert p is not None
        cl = molcell.build_cell(sim.state, p)
        assert not bool(cl.overflow)
        f2, ev2, ec2, vir2 = molcell.compute(ff.pair, sim.state, cl,
                                             True, True,
                                             special=ff.special)
        scale = float(jnp.abs(f_ref).max())
        assert float(jnp.abs(f2 - f_ref).max()) < scale * 1e-13
        assert float(ev2) == pytest.approx(float(ev), rel=1e-12)
        assert float(ec2) == pytest.approx(float(ec), rel=1e-12)
        np.testing.assert_allclose(np.asarray(vir2), np.asarray(vir),
                                   rtol=1e-12)

    def test_trajectory_matches_matrix(self):
        """20 NVT+SHAKE+PPPM steps incl. neighbor rebuilds through the
        full segment runner in both engines."""
        rows = {}
        for mode in ("matrix", "molcell"):
            s = _water_script(mode, run=20)
            st = s.sim.state
            valid = np.asarray(st.valid_mask)
            order = np.argsort(np.asarray(st.tag)[valid])
            rows[mode] = (np.asarray(st.x)[valid][order],
                          np.asarray(st.v)[valid][order])
        dx = np.abs(rows["matrix"][0] - rows["molcell"][0])
        prd = 37.0  # > any real displacement; wrap-free compare via min
        dx = np.minimum(dx, np.abs(dx - np.round(dx / prd) * prd))
        assert dx.max() < 1e-9
        dv = np.abs(rows["matrix"][1] - rows["molcell"][1])
        assert dv.max() < 1e-9
