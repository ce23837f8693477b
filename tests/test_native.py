"""Native C++ data reader: parity with the Python parser + speed sanity."""

import time

import numpy as np
import pytest

from lammps_kokkos_port_tpu.io.data_reader import read_data
from lammps_kokkos_port_tpu.io.native import get_lib, read_data_native

CHAIN = "/root/reference/bench/data.chain"
FOURMOL = "/root/reference/unittest/force-styles/tests/data.fourmol"


@pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")
class TestNativeReader:
    @pytest.mark.parametrize("path,style", [(CHAIN, "bond"),
                                            (FOURMOL, "full")])
    def test_parity_with_python(self, path, style):
        a = read_data_native(path, style)
        b = read_data(path, atom_style=style, use_native=False)
        assert a.natoms == b.natoms and a.nbonds == b.nbonds
        np.testing.assert_array_equal(a.types, b.types)
        np.testing.assert_allclose(a.x, b.x, rtol=0, atol=0)
        np.testing.assert_allclose(a.v, b.v, rtol=0, atol=0)
        np.testing.assert_allclose(a.masses, b.masses)
        if b.bonds is not None:
            np.testing.assert_array_equal(a.bonds, b.bonds)
        if b.q is not None:
            np.testing.assert_allclose(a.q, b.q)
        if b.molecule is not None:
            np.testing.assert_array_equal(a.molecule, b.molecule)
        np.testing.assert_array_equal(a.image, b.image)
        assert (a.xlo, a.xhi, a.xy) == (b.xlo, b.xhi, b.xy)

    def test_native_is_faster_on_32k(self):
        t0 = time.perf_counter()
        read_data_native(CHAIN, "bond")
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        read_data(CHAIN, atom_style="bond", use_native=False)
        t_py = time.perf_counter() - t0
        assert t_native < t_py  # typically ~40x
