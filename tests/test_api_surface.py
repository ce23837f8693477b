"""Library embedding API surface (ref: src/library.cpp lammps_* —
subsets, topology gathers, neighbor introspection, config queries)."""

import numpy as np
import pytest

from lammps_kokkos_port_tpu.api import lammps

MELT = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 3 0 3 0 3
create_box      1 box
create_atoms    1 box
mass            1 1.0
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all nve
run             0
"""

WATER_TOP = """
units           real
atom_style      full
bond_style      harmonic
angle_style     harmonic
region          box block 0 20 0 20 0 20
create_box      2 box
"""


@pytest.fixture()
def lmp():
    h = lammps()
    h.commands_string(MELT)
    return h


class TestSubsets:
    def test_map_atom(self, lmp):
        assert lmp.map_atom(1) == 0
        assert lmp.map_atom(5) == 4
        assert lmp.map_atom(10**6) == -1

    def test_gather_scatter_subset(self, lmp):
        ids = [3, 7, 11]
        x = lmp.gather_atoms_subset("x", ids)
        assert x.shape == (3, 3)
        full = lmp.gather_atoms("x")
        np.testing.assert_allclose(x, full[[2, 6, 10]])
        v = np.full((3, 3), 0.25)
        lmp.scatter_atoms_subset("v", ids, v)
        vv = lmp.gather_atoms_subset("v", ids)
        np.testing.assert_allclose(vv, v)
        # others untouched
        assert np.all(lmp.gather_atoms("v")[[0, 1]] == 0.0)


class TestNeighborIntrospection:
    def test_find_and_counts(self, lmp):
        h = lmp.find_pair_neighlist("lj/cut")
        assert h == 0
        assert lmp.neighlist_num_elements(h) == 108

    def test_element_neighbors(self, lmp):
        h = lmp.find_pair_neighlist()
        i, neigh = lmp.neighlist_element_neighbors(h, 0)
        assert i == 0
        # fcc shells within 2.5 sigma at 0.8442 density:
        # 12 (1.19) + 6 (1.68) + 24 (2.06) + 12 (2.37) = 54
        assert len(neigh) == 54
        # symmetric: 0 appears in each listed partner's own list
        for j in neigh[:3]:
            _, nj = lmp.neighlist_element_neighbors(h, int(j))
            assert 0 in nj


class TestTopologyGathers:
    def test_gather_bonds_empty_for_atomic(self, lmp):
        assert lmp.gather_bonds().size == 0

    def test_gather_bonds_molecular(self, tmp_path):
        data = tmp_path / "data.dimer"
        data.write_text("""dimer

4 atoms
2 bonds
1 angles
2 atom types
1 bond types
1 angle types
0 20 xlo xhi
0 20 ylo yhi
0 20 zlo zhi

Masses

1 1.0
2 2.0

Atoms

1 1 1 0.0 1.0 1.0 1.0
2 1 1 0.0 2.0 1.5 1.0
3 1 2 0.0 3.0 1.0 1.0
4 1 2 0.0 4.0 1.2 1.0

Bonds

1 1 1 2
2 1 3 4

Angles

1 1 1 2 3
""")
        h = lammps()
        h.commands_string(f"""
units           real
atom_style      full
bond_style      harmonic
angle_style     harmonic
pair_style      lj/cut 5.0
read_data       {data}
bond_coeff      1 100.0 1.0
angle_coeff     1 50.0 120.0
pair_coeff      * * 0.1 1.0
fix             1 all nve
run             0
""")
        b = h.gather_bonds()
        assert b.shape == (2, 3)
        assert set(map(tuple, b[:, 1:])) == {(1, 2), (3, 4)}
        a = h.gather_angles()
        assert a.shape == (1, 4)
        assert tuple(a[0, 1:]) == (1, 2, 3)


class TestConfigAndErrors:
    def test_config_queries(self):
        h = lammps()
        assert not h.config_has_mpi_support()
        assert h.config_has_package("KOKKOS")
        assert h.config_package_count() == 8
        assert h.config_package_name(0) == "KOKKOS"
        assert isinstance(h.get_os_info(), str)
        assert h.get_gpu_device_count() >= 0

    def test_datatypes(self, lmp):
        assert lmp.extract_atom_datatype("x") == 3
        assert lmp.extract_atom_datatype("type") == 0
        assert lmp.extract_atom_datatype("nope") == -1
        assert lmp.extract_global_datatype("dt") == 2

    def test_error_capture(self, lmp):
        assert not lmp.has_error()
        with pytest.raises(Exception):
            lmp.command("bogus_command_xyz")
        assert lmp.has_error()
        assert "bogus_command_xyz" in lmp.get_last_error_message()
        lmp.command("thermo 10")
        assert not lmp.has_error()

    def test_memory_usage(self, lmp):
        m = lmp.memory_usage()
        assert m["device_bytes"] > 0

    def test_image_flags(self):
        h = lammps()
        enc = h.encode_image_flags(1, -1, 0)
        assert h.decode_image_flags(np.asarray(enc)) == (1, -1, 0)
