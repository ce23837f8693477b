"""Core state/box/lattice/velocity tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.core.box import Box
from lammps_kokkos_port_tpu.core.lattice import Lattice, create_atoms
from lammps_kokkos_port_tpu.core.state import create_state
from lammps_kokkos_port_tpu.core.velocity import (
    create_velocities_geom,
    temperature,
)
from lammps_kokkos_port_tpu.utils.units import get_units


class TestBox:
    def test_ortho_transforms_roundtrip(self, rng):
        box = Box.create([0.0, -1.0, 2.0], [10.0, 4.0, 9.0], dtype=jnp.float64)
        x = rng.uniform(-20, 30, (50, 3))
        lam = box.to_lamda(x)
        back = box.to_box(lam)
        np.testing.assert_allclose(back, x, atol=1e-12)

    def test_triclinic_transforms_roundtrip(self, rng):
        box = Box.create(
            [0.0, 0.0, 0.0], [10.0, 8.0, 6.0], tilt=[2.0, 1.0, -1.5],
            dtype=jnp.float64,
        )
        x = rng.uniform(-20, 30, (50, 3))
        np.testing.assert_allclose(box.to_box(box.to_lamda(x)), x, atol=1e-12)

    def test_wrap_puts_atoms_in_box(self, rng):
        box = Box.create([0.0, 0.0, 0.0], [5.0, 6.0, 7.0], dtype=jnp.float64)
        x = rng.uniform(-30, 30, (100, 3))
        image = jnp.zeros((100, 3), dtype=jnp.int32)
        xw, img = box.wrap(x, image)
        lam = np.asarray(box.to_lamda(xw))
        assert lam.min() >= -1e-12 and lam.max() < 1.0 + 1e-12
        # unwrap restores originals
        np.testing.assert_allclose(np.asarray(box.unwrap(xw, img)), x, atol=1e-10)

    def test_min_image_ortho(self):
        box = Box.create([0.0, 0.0, 0.0], [10.0, 10.0, 10.0], dtype=jnp.float64)
        dx = jnp.asarray([[9.0, -9.5, 4.9]])
        mi = np.asarray(box.min_image(dx))
        np.testing.assert_allclose(mi, [[-1.0, 0.5, 4.9]], atol=1e-12)

    def test_min_image_triclinic_matches_bruteforce(self, rng):
        box = Box.create(
            [0.0, 0.0, 0.0], [8.0, 9.0, 10.0], tilt=[1.5, -1.0, 2.0],
            dtype=jnp.float64,
        )
        h = np.asarray(box.h)
        dx = rng.uniform(-15, 15, (200, 3))
        mi = np.asarray(box.min_image(jnp.asarray(dx)))
        # brute force: min over all image shifts up to +-2 cells
        r = (-2, -1, 0, 1, 2)
        shifts = np.array([[i, j, k] for i in r for j in r for k in r])
        cands = dx[:, None, :] + (shifts @ h.T)[None]
        best_r2 = (cands**2).sum(-1).min(axis=1)
        mi_r2 = (mi**2).sum(-1)
        # the convention is exact for separations below half the smallest
        # cell height (the MD-valid regime); beyond that it may only
        # overestimate, never underestimate
        heights = np.abs(np.linalg.det(h)) / np.array([
            np.linalg.norm(np.cross(h[:, 1], h[:, 2])),
            np.linalg.norm(np.cross(h[:, 0], h[:, 2])),
            np.linalg.norm(np.cross(h[:, 0], h[:, 1])),
        ])
        rc2 = (0.45 * heights.min()) ** 2
        close = best_r2 < rc2
        assert close.sum() > 5
        np.testing.assert_allclose(mi_r2[close], best_r2[close], atol=1e-9)
        assert np.all(mi_r2 >= best_r2 - 1e-9)

    def test_volume(self):
        box = Box.create([0, 0, 0], [2.0, 3.0, 4.0], dtype=jnp.float64)
        assert float(box.volume) == pytest.approx(24.0)


class TestLattice:
    def test_fcc_melt_atom_count(self):
        # 10^3 cells x 4 basis = 4000 atoms (ref: examples/melt log)
        lat = Lattice(style="fcc", scale=0.8442, units_name="lj")
        sp = lat.spacing
        x, t = create_atoms(lat, [0, 0, 0], [10 * sp[0], 10 * sp[1], 10 * sp[2]])
        assert len(x) == 4000

    def test_fcc_lattice_constant_lj(self):
        lat = Lattice(style="fcc", scale=0.8442, units_name="lj")
        a = lat._lattice_constant()
        assert a == pytest.approx((4.0 / 0.8442) ** (1.0 / 3.0), rel=1e-15)

    def test_metal_lattice_constant_is_direct(self):
        lat = Lattice(style="fcc", scale=3.615, units_name="metal")
        assert lat._lattice_constant() == 3.615

    def test_bcc_count(self):
        lat = Lattice(style="bcc", scale=1.0, units_name="metal")
        x, _ = create_atoms(lat, [0, 0, 0], [4, 4, 4])
        assert len(x) == 4 * 4 * 4 * 2

    def test_no_duplicates(self):
        lat = Lattice(style="fcc", scale=0.8442, units_name="lj")
        sp = lat.spacing
        x, _ = create_atoms(lat, [0, 0, 0], [5 * sp[0], 5 * sp[1], 5 * sp[2]])
        assert len(np.unique(np.round(x / 1e-9).astype(np.int64), axis=0)) == len(x)


class TestVelocity:
    def test_geom_temperature_exact(self):
        lat = Lattice(style="fcc", scale=0.8442, units_name="lj")
        sp = lat.spacing
        x, types = create_atoms(lat, [0, 0, 0], [5 * sp[0]] * 3)
        units = get_units("lj")
        m = np.ones(len(x))
        v = create_velocities_geom(x, m, 3.0, 87287, units)
        t = temperature(v, m, units)
        assert t == pytest.approx(3.0, rel=1e-12)

    def test_geom_zero_momentum(self):
        lat = Lattice(style="fcc", scale=0.8442, units_name="lj")
        sp = lat.spacing
        x, _ = create_atoms(lat, [0, 0, 0], [4 * sp[0]] * 3)
        units = get_units("lj")
        m = np.ones(len(x))
        v = create_velocities_geom(x, m, 3.0, 87287, units)
        np.testing.assert_allclose((m[:, None] * v).sum(0), 0.0, atol=1e-10)

    def test_geom_decomposition_invariant(self):
        # permuting atoms permutes velocities identically (coord-hash RNG)
        lat = Lattice(style="fcc", scale=0.8442, units_name="lj")
        sp = lat.spacing
        x, _ = create_atoms(lat, [0, 0, 0], [3 * sp[0]] * 3)
        units = get_units("lj")
        m = np.ones(len(x))
        v1 = create_velocities_geom(x, m, 1.5, 12345, units)
        perm = np.random.default_rng(0).permutation(len(x))
        v2 = create_velocities_geom(x[perm], m, 1.5, 12345, units)
        np.testing.assert_allclose(v2, v1[perm], atol=1e-12)

    def test_gaussian_dist_runs(self):
        x = np.random.default_rng(3).uniform(0, 10, (500, 3))
        units = get_units("lj")
        m = np.ones(len(x))
        v = create_velocities_geom(
            x, m, 2.0, 999, units, dist="gaussian"
        )
        t = temperature(v, m, units)
        assert t == pytest.approx(2.0, rel=1e-12)


class TestState:
    def test_padding_and_masks(self):
        box = Box.create([0, 0, 0], [5, 5, 5], dtype=jnp.float64)
        x = np.array([[1.0, 1, 1], [2, 2, 2], [3, 3, 3]])
        st = create_state(x, box, dtype=jnp.float64, pad_multiple=8)
        assert st.capacity == 8
        assert int(st.nlocal) == 3
        mask = np.asarray(st.valid_mask)
        assert mask.sum() == 3
        assert np.all(np.asarray(st.type)[3:] == 0)
        assert np.all(np.asarray(st.tag)[:3] == [1, 2, 3])

    def test_mass_lookup(self):
        box = Box.create([0, 0, 0], [5, 5, 5], dtype=jnp.float64)
        x = np.zeros((2, 3))
        st = create_state(
            x, box, types=np.array([1, 2]), masses=np.array([1.0, 2.5, 4.0]),
            dtype=jnp.float64,
        )
        pm = np.asarray(st.per_atom_mass)
        assert pm[0] == 2.5 and pm[1] == 4.0
