"""Molecular-system tests: data reader, topology/special bonds, bonded
styles (autodiff self-consistency + analytic spot checks), and the FENE
chain benchmark golden (bench/in.chain vs log.6Oct16.chain.fixed.icc.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.core.box import Box
from lammps_kokkos_port_tpu.core.state import create_state
from lammps_kokkos_port_tpu.core.topology import build_special, pad_topology
from lammps_kokkos_port_tpu.io.data_reader import read_data
from lammps_kokkos_port_tpu.models import bonded
from lammps_kokkos_port_tpu.models.forcefield import ForceField

DATA_CHAIN = "/root/reference/bench/data.chain"

# golden from bench/log.6Oct16.chain.fixed.icc.1 (lj units, per-atom norm)
CHAIN0 = dict(temp=0.97029772, epair=0.44484087, emol=20.494523,
              etotal=22.394765, press=4.6721833)
CHAIN100 = dict(temp=0.9729966, epair=0.4361122, emol=20.507698,
                etotal=22.40326, press=4.6548819)


class TestDataReader:
    def test_chain_header_and_sections(self):
        df = read_data(DATA_CHAIN, atom_style="bond")
        assert df.natoms == 32000 and df.nbonds == 31680
        assert df.natomtypes == 1 and df.nbondtypes == 1
        assert df.xlo == pytest.approx(-16.796)
        assert df.masses[1] == 1.0
        assert df.bonds.shape == (31680, 3)
        assert np.all(df.tags == np.arange(1, 32001))
        # velocities were read
        assert abs(df.v).max() > 0


class TestSpecialBonds:
    def test_linear_chain_classes(self):
        # 5-atom chain 0-1-2-3-4
        bonds = np.array([[0, 1], [1, 2], [2, 3], [3, 4]])
        sp = build_special(5, 8, bonds, weights_lj=(0.0, 1.0, 1.0))
        idx = np.asarray(sp.idx)
        cls = np.asarray(sp.cls)
        # atom 0: 1-2={1}, 1-3={2}, 1-4={3}
        row = {(int(i), int(c)) for i, c in zip(idx[0], cls[0]) if i < 8}
        assert row == {(1, 1), (2, 2), (3, 3)}
        # atom 2 (middle): 1-2={1,3}, 1-3={0,4}, 1-4={}
        row = {(int(i), int(c)) for i, c in zip(idx[2], cls[2]) if i < 8}
        assert row == {(1, 1), (3, 1), (0, 2), (4, 2)}


def _two_atom_state(r, dtype=jnp.float64):
    box = Box.create([0, 0, 0], [20.0, 20.0, 20.0], dtype=dtype)
    x = np.array([[5.0, 5.0, 5.0], [5.0 + r, 5.0, 5.0]])
    return create_state(x, box, dtype=dtype)


class TestBondedStyles:
    def test_bond_harmonic_energy_force(self):
        st = _two_atom_state(1.3)
        style = bonded.make_bond_harmonic(1, {1: (100.0, 1.0)})
        top = pad_topology(st.capacity, bonds=np.array([[1, 0, 1]]))
        f, e, v = bonded.compute_bonds(style, st, top, True, True)
        assert float(e) == pytest.approx(100.0 * 0.3**2)
        # force on atom 0 along -x: dE/dr = 2*K*dr = 60; atom0 pulled toward 1
        f = np.asarray(f)
        assert f[0, 0] == pytest.approx(60.0)
        assert f[1, 0] == pytest.approx(-60.0)

    def test_angle_harmonic_energy(self):
        box = Box.create([0, 0, 0], [20.0] * 3, dtype=jnp.float64)
        # 90-degree angle, theta0 = 109.47
        x = np.array([[1.0, 0, 0], [0.0, 0, 0], [0, 1.0, 0]])
        st = create_state(x, box, dtype=jnp.float64)
        style = bonded.make_angle_harmonic(1, {1: (50.0, 109.47)})
        top = pad_topology(st.capacity, angles=np.array([[1, 0, 1, 2]]))
        f, e, v = bonded.compute_angles(style, st, top, True, True)
        want = 50.0 * (np.pi / 2 - 109.47 * np.pi / 180) ** 2
        assert float(e) == pytest.approx(want, rel=1e-10)
        # forces sum to zero
        np.testing.assert_allclose(np.asarray(f).sum(0), 0.0, atol=1e-12)

    def test_dihedral_charmm_energy(self):
        box = Box.create([0, 0, 0], [20.0] * 3, dtype=jnp.float64)
        # planar trans configuration: phi = 180
        x = np.array([
            [0.0, 1.0, 0.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, -1.0, 0.0]
        ])
        st = create_state(x, box, dtype=jnp.float64)
        style = bonded.make_dihedral_charmm(1, {1: (2.0, 2.0, 180.0)})
        top = pad_topology(st.capacity, dihedrals=np.array([[1, 0, 1, 2, 3]]))
        f, e, v, _ = bonded.compute_dihedrals(style, st, top, True, True)
        # E = K(1+cos(n*180 - 180)) = K(1+cos(180)) = 0
        assert float(e) == pytest.approx(2.0 * (1 + np.cos(2 * np.pi - np.pi)),
                                         abs=1e-9)
        np.testing.assert_allclose(np.asarray(f).sum(0), 0.0, atol=1e-10)

    def test_improper_harmonic_zero_at_cis_planar(self):
        box = Box.create([0, 0, 0], [20.0] * 3, dtype=jnp.float64)
        # cis-planar (chi = 0 in the reference's convention)
        x = np.array([
            [0.0, 1.0, 0], [0.0, 0.0, 0], [1.0, 0.0, 0], [1.0, 1.0, 0.0]
        ])
        st = create_state(x, box, dtype=jnp.float64)
        style = bonded.make_improper_harmonic(1, {1: (10.0, 0.0)})
        top = pad_topology(st.capacity, impropers=np.array([[1, 0, 1, 2, 3]]))
        f, e, v, _ = bonded.compute_dihedrals(style, st, top, True, True,
                                              which="impropers")
        assert float(e) == pytest.approx(0.0, abs=1e-6)
        # out-of-plane displacement costs energy
        x2 = x.copy()
        x2[3, 2] = 0.5
        st2 = create_state(x2, box, dtype=jnp.float64)
        f2, e2, v2, _ = bonded.compute_dihedrals(style, st2, top, True, True,
                                                 which="impropers")
        assert float(e2) > 0.1


@pytest.mark.slow
class TestChainGolden:
    def test_step0_golden(self):
        from lammps_kokkos_port_tpu.presets import chain_sim

        sim = chain_sim(dtype=jnp.float64)
        sim.setup()
        row = sim.thermo()
        assert row["natoms"] == 32000
        assert row["temp"] == pytest.approx(CHAIN0["temp"], rel=1e-7)
        assert row["epair"] == pytest.approx(CHAIN0["epair"], rel=1e-6)
        assert row["emol"] == pytest.approx(CHAIN0["emol"], rel=1e-6)
        assert row["etotal"] == pytest.approx(CHAIN0["etotal"], rel=1e-6)
        assert row["press"] == pytest.approx(CHAIN0["press"], rel=1e-5)

    def test_trajectory_100_steps(self):
        from lammps_kokkos_port_tpu.presets import chain_sim

        sim = chain_sim(dtype=jnp.float64)
        sim.setup()
        rows = sim.run(100, thermo_every=100)
        r = rows[-1]
        # langevin noise streams differ from the reference's RanMars, so
        # only statistical agreement is expected
        assert r["temp"] == pytest.approx(CHAIN100["temp"], abs=0.02)
        assert r["epair"] == pytest.approx(CHAIN100["epair"], abs=0.02)
        assert r["emol"] == pytest.approx(CHAIN100["emol"], abs=0.05)
        assert r["etotal"] == pytest.approx(CHAIN100["etotal"], abs=0.05)


class TestPairHybrid:
    def test_hybrid_matches_single_style(self, rng=None):
        """hybrid with lj/cut per pair-type == one lj/cut with the same
        coeffs."""
        import numpy as np
        from lammps_kokkos_port_tpu.core.box import Box
        from lammps_kokkos_port_tpu.core.state import create_state
        from lammps_kokkos_port_tpu.models.pair_lj import make_lj_cut
        from lammps_kokkos_port_tpu.models.pair_zbl import make_hybrid
        from lammps_kokkos_port_tpu.ops import neighbor as nbr

        r = np.random.default_rng(5)
        box = Box.create([0, 0, 0], [12.0] * 3, dtype=jnp.float64)
        x = r.uniform(0, 12, (120, 3))
        types = r.integers(1, 3, 120).astype(np.int32)
        st = create_state(x, box, types=types, dtype=jnp.float64)

        coeffs = {(1, 1): (1.0, 1.0), (2, 2): (0.6, 1.2), (1, 2): (0.8, 1.1)}
        ref = make_lj_cut(2, coeffs, 2.5, dtype=jnp.float64)

        s11 = make_lj_cut(2, coeffs, 2.5, dtype=jnp.float64)
        s22 = make_lj_cut(2, coeffs, 2.5, dtype=jnp.float64)
        s12 = make_lj_cut(2, coeffs, 2.5, dtype=jnp.float64)
        hyb = make_hybrid(2, [(s11, [(1, 1)]), (s22, [(2, 2)]),
                              (s12, [(1, 2)])])

        p = nbr.size_for_system(st, cutneigh=2.8, skin=0.3)
        nl = nbr.build(st, p)
        while bool(nl.overflow):
            p = nbr.grow(p)
            nl = nbr.build(st, p)
        f1, e1, v1 = ref.compute(st, nl, True, True)
        f2, e2, v2 = hyb.compute(st, nl, True, True)
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-10)
        assert float(e2) == pytest.approx(float(e1), rel=1e-12)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-10)


class TestRowBlockChunking:
    def test_chunked_matches_unchunked(self, monkeypatch, tmp_path):
        """map_row_blocks (the memory-bounded matrix-engine path used at
        molecular K, e.g. bench/in.rhodo at 32k atoms) must be bit-stable
        against the single-block evaluation."""
        import os
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "benchmarks"))
        from make_rhodo_water import write_data

        from lammps_kokkos_port_tpu.models import pair as pair_mod
        from lammps_kokkos_port_tpu.script import LammpsScript

        data = str(tmp_path / "data.rw")
        write_data(data, nside=7)
        deck = """
units           real
atom_style      full
bond_style      harmonic
angle_style     charmm
pair_style      lj/charmm/coul/long 8.0 10.0
pair_modify     mix arithmetic
read_data       {data}
special_bonds   charmm
run             0
"""

        def forces():
            s = LammpsScript(dtype=jnp.float64)
            for ln in deck.format(data=data).strip().splitlines():
                s.one(ln)
            sim = s.sim
            f, pe, _, vir = sim.force_fn(sim.state, sim.nl, True, True)
            valid = np.asarray(jax.device_get(sim.state.valid_mask))
            tag = np.asarray(sim.state.tag)[valid]
            return (np.asarray(f)[valid][np.argsort(tag)], float(pe),
                    np.asarray(vir))

        f0, pe0, v0 = forces()
        monkeypatch.setattr(pair_mod, "_PAIR_ELEMS_LIMIT", 1024)
        f1, pe1, v1 = forces()
        np.testing.assert_allclose(f1, f0, atol=1e-12)
        assert pe1 == pytest.approx(pe0, rel=1e-12)
        np.testing.assert_allclose(v1, v0, rtol=1e-12)
