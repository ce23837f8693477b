"""Structural/local compute styles + cfg/local dump writers.

Validated against brute-force numpy on small systems
(ref: src/compute_cluster_atom.cpp, compute_centro_atom.cpp,
compute_cna_atom.cpp, compute_pair_local.cpp, compute_bond_local.cpp,
compute_inertia_chunk.cpp, dump_cfg.cpp, dump_local.cpp).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.script import LammpsScript


def run_deck(text, dtype=jnp.float64):
    s = LammpsScript(dtype=dtype)
    for line in text.strip().splitlines():
        s.one(line)
    return s


FCC_DECK = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all nve
run             0
"""


class TestStructuralComputes:
    def test_centro_perfect_fcc_is_zero(self):
        s = run_deck(FCC_DECK)
        s.one("compute c all centro/atom fcc")
        out = s.get_compute("c")
        assert out.shape[0] == 256
        assert np.max(np.abs(out)) < 1e-8

    def test_centro_vacancy_nonzero(self):
        s = run_deck(FCC_DECK)
        # remove one atom -> the 12 former neighbors lose central symmetry
        s.one("region void sphere 0.0 0.0 0.0 0.1 units box")
        s.one("delete_atoms region void")
        s.one("run 0")
        s.one("compute c all centro/atom fcc")
        out = s.get_compute("c")
        assert np.sum(out > 1e-3) >= 6

    def test_cna_perfect_fcc(self):
        s = run_deck(FCC_DECK)
        # fcc nearest-neighbor distance a/sqrt(2); cutoff halfway to 2nd NN
        # (ref: compute_cna_atom.cpp suggested r_c = (1+sqrt(2))/2 * a_nn)
        a = (4.0 / 0.8442) ** (1.0 / 3.0)
        rc = 0.5 * (1 + np.sqrt(2)) / np.sqrt(2) * a
        s.one(f"compute c all cna/atom {rc:.6f}")
        out = s.get_compute("c")
        assert np.all(out == 1.0), np.unique(out)

    def test_cna_perfect_bcc(self):
        # BCC signatures are (4,4,2,2)x6 + (6,6,2,2)x8 over the 14 nearest
        # neighbors (ref: compute_cna_atom.cpp:329-340) — unreachable with
        # the (ncommon, nbonds, maxchain) triple the port used before r5
        s = run_deck("""
units           lj
atom_style      atomic
lattice         bcc 0.8442
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all nve
run             0
""")
        # bcc cutoff: between 2nd (a) and 3rd (a*sqrt(2)) neighbor shells
        a = (2.0 / 0.8442) ** (1.0 / 3.0)
        rc = 0.5 * (1.0 + np.sqrt(2.0)) * a
        s.one(f"compute c all cna/atom {rc:.6f}")
        out = s.get_compute("c")
        assert np.all(out == 3.0), np.unique(out)

    def test_cluster_two_dimers(self):
        s = LammpsScript(dtype=jnp.float64)
        for ln in """
units           lj
atom_style      atomic
region          box block 0 20 0 20 0 20
create_box      1 box
create_atoms    1 single 1.0 1.0 1.0
create_atoms    1 single 1.8 1.0 1.0
create_atoms    1 single 10.0 10.0 10.0
create_atoms    1 single 10.8 10.0 10.0
mass            1 1.0
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all nve
run             0
""".strip().splitlines():
            s.one(ln)
        s.one("compute cl all cluster/atom 1.2")
        out = np.sort(s.get_compute("cl"))
        # two clusters, each labeled by its smallest atom ID
        assert set(np.unique(out)) == {1.0, 3.0}
        assert np.sum(out == 1.0) == 2 and np.sum(out == 3.0) == 2


class TestLocalComputes:
    def test_pair_local_dimer(self):
        s = LammpsScript(dtype=jnp.float64)
        for ln in """
units           lj
atom_style      atomic
region          box block 0 10 0 10 0 10
create_box      1 box
create_atoms    1 single 1.0 1.0 1.0
create_atoms    1 single 2.1 1.0 1.0
mass            1 1.0
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all nve
run             0
""".strip().splitlines():
            s.one(ln)
        s.one("compute pl all pair/local dist eng")
        out = np.atleast_2d(s.get_compute("pl"))
        assert out.shape[0] == 1
        r = 1.1
        assert out[0, 0] == pytest.approx(r, rel=1e-12)
        e = 4 * ((1 / r) ** 12 - (1 / r) ** 6)
        assert out[0, 1] == pytest.approx(e, rel=1e-10)

    def test_bond_local_harmonic(self):
        s = LammpsScript(dtype=jnp.float64)
        import tempfile

        data = """bond test

2 atoms
1 bonds
1 atom types
1 bond types

0 10 xlo xhi
0 10 ylo yhi
0 10 zlo zhi

Masses

1 1.0

Atoms

1 1 1 0.0 1.0 1.0 1.0
2 1 1 0.0 2.5 1.0 1.0

Bonds

1 1 1 2
"""
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "data.bond")
            open(p, "w").write(data)
            for ln in f"""
units           real
atom_style      full
bond_style      harmonic
pair_style      lj/cut 3.0
read_data       {p}
pair_coeff      1 1 0.0 1.0
bond_coeff      1 100.0 1.2
fix             1 all nve
run             0
""".strip().splitlines():
                s.one(ln)
        s.one("compute bl all bond/local dist eng")
        out = np.atleast_2d(s.get_compute("bl"))
        assert out.shape == (1, 2)
        assert out[0, 0] == pytest.approx(1.5, rel=1e-12)
        # E = K (r - r0)^2 (LAMMPS convention, no 1/2)
        assert out[0, 1] == pytest.approx(100.0 * 0.3 ** 2, rel=1e-10)

    def test_inertia_chunk(self):
        s = LammpsScript(dtype=jnp.float64)
        import tempfile

        data = """inertia test

3 atoms
1 atom types

0 10 xlo xhi
0 10 ylo yhi
0 10 zlo zhi

Masses

1 2.0

Atoms

1 1 1 0.0 4.0 5.0 5.0
2 1 1 0.0 5.0 5.0 5.0
3 1 1 0.0 6.0 5.0 5.0
"""
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "data.tri")
            open(p, "w").write(data)
            for ln in f"""
units           real
atom_style      full
pair_style      lj/cut 3.0
read_data       {p}
pair_coeff      1 1 0.0 1.0
fix             1 all nve
run             0
""".strip().splitlines():
                s.one(ln)
        s.one("compute ic all inertia/chunk mol")
        out = np.atleast_2d(s.get_compute("ic"))
        # rod along x, masses 2 at x = -1, 0, +1 about COM:
        # Ixx = 0, Iyy = Izz = 2*2*1^2 = 4, products 0
        assert out[0, 0] == pytest.approx(0.0, abs=1e-10)
        assert out[0, 1] == pytest.approx(4.0, rel=1e-12)
        assert out[0, 2] == pytest.approx(4.0, rel=1e-12)
        assert np.allclose(out[0, 3:], 0.0, atol=1e-10)


class TestDumpWriters:
    def test_dump_cfg(self, tmp_path):
        s = run_deck(FCC_DECK)
        path = str(tmp_path / "snap.cfg")
        s.one(f"dump d1 all cfg 1 {path} mass type xs ys zs id")
        s.one("run 0")
        s.one(f"undump d1")
        txt = open(path).read()
        lines = txt.splitlines()
        assert lines[0] == "Number of particles = 256"
        assert any(l.startswith("H0(1,1)") for l in lines)
        assert "entry_count = 4" in txt
        assert "auxiliary[0] = id" in txt
        # per-atom: mass line, type line, coord line
        body = lines[lines.index(".NO_VELOCITY.") + 3:]
        assert body[0].strip() == "1"  # mass 1.0 printed as 1
        coords = body[2].split()
        assert len(coords) == 4  # xs ys zs id
        svals = [float(c) for c in coords[:3]]
        assert all(0.0 <= c <= 1.0 for c in svals)

    def test_dump_local_pair(self, tmp_path):
        s = LammpsScript(dtype=jnp.float64)
        for ln in """
units           lj
atom_style      atomic
region          box block 0 10 0 10 0 10
create_box      1 box
create_atoms    1 single 1.0 1.0 1.0
create_atoms    1 single 2.1 1.0 1.0
mass            1 1.0
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all nve
""".strip().splitlines():
            s.one(ln)
        path = str(tmp_path / "pairs.dump")
        s.one("compute pl all pair/local dist eng")
        s.one(f"dump d1 all local 1 {path} index c_pl[1] c_pl[2]")
        s.one("run 0")
        txt = open(path).read()
        assert "ITEM: NUMBER OF ENTRIES\n1" in txt
        assert "ITEM: ENTRIES index c_pl[1] c_pl[2]" in txt
        row = txt.splitlines()[-1].split()
        assert row[0] == "1"
        assert float(row[1]) == pytest.approx(1.1, rel=1e-6)
