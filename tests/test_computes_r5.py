"""Round-5 compute styles vs brute-force numpy (ref:
src/compute_{temp_partial,temp_region,count_type,vcm_chunk,
gyration_chunk,angmom_chunk,heat_flux,angle_local,dihedral_local,
property_local,slice}.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.script import LammpsScript

MELT = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 3 0 3 0 3
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 2.0 4928 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all nve
run             4
"""


def melt():
    s = LammpsScript(dtype=jnp.float64)
    for ln in MELT.strip().splitlines():
        s.one(ln)
    return s


WATER = """
units           real
atom_style      full
bond_style      harmonic
angle_style     harmonic
pair_style      lj/cut/coul/cut 5.0
read_data       {data}
bond_coeff      1 450.0 0.9572
angle_coeff     1 55.0 104.52
pair_coeff      * * 0.1521 3.1507
fix             1 all nve
run             0
"""


@pytest.fixture(scope="module")
def water(tmp_path_factory):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    from make_rhodo_water import write_data

    path = str(tmp_path_factory.mktemp("w5") / "data.w")
    write_data(path, nside=(3, 3, 3))
    s = LammpsScript(dtype=jnp.float64)
    for ln in WATER.format(data=path).strip().splitlines():
        s.one(ln)
    return s


def _vmg(s):
    st = s.sim.state
    valid = np.asarray(jax.device_get(st.valid_mask))
    v = np.asarray(jax.device_get(st.v))[valid]
    m = np.asarray(jax.device_get(st.per_atom_mass))[valid]
    x = np.asarray(jax.device_get(st.x))[valid]
    return v, m, x


class TestTempVariants:
    def test_temp_partial(self):
        s = melt()
        s.one("compute tx all temp/partial 1 0 0")
        v, m, _ = _vmg(s)
        n = len(v)
        ref = (m * v[:, 0] ** 2).sum() / (n - 1)
        assert s.get_compute("tx") == pytest.approx(ref, rel=1e-12)

    def test_temp_region(self):
        # run-0 state: lattice positions are exactly inside the box, so
        # the region's INF bounds (box edges) match the brute-force
        # selection without wrap bookkeeping
        s = LammpsScript(dtype=jnp.float64)
        for ln in MELT.replace("run             4",
                               "run             0"
                               ).strip().splitlines():
            s.one(ln)
        s.one("region half block 0 1.5 INF INF INF INF")
        s.one("compute tr all temp/region half")
        v, m, x = _vmg(s)
        sp = s.lattice.spacing[0]
        sel = (x[:, 0] >= 0) & (x[:, 0] <= 1.5 * sp)
        ref = (m[sel] * (v[sel] ** 2).sum(-1)).sum() / (3 * sel.sum())
        assert s.get_compute("tr") == pytest.approx(ref, rel=1e-12)

    def test_count_type(self):
        s = melt()
        s.one("compute ct all count/type atom")
        out = s.get_compute("ct")
        assert out.tolist() == [108]


class TestChunkExtras:
    def test_vcm_and_angmom_chunk(self, water):
        s = water
        s.one("compute ch all chunk/atom molecule")
        s.one("compute vc all vcm/chunk ch")
        s.one("compute am all angmom/chunk ch")
        s.one("compute rg all gyration/chunk ch")
        st = s.sim.state
        valid = np.asarray(jax.device_get(st.valid_mask))
        mol = np.asarray(jax.device_get(st.molecule))[valid]
        v = np.asarray(jax.device_get(st.v))[valid]
        m = np.asarray(jax.device_get(st.per_atom_mass))[valid]
        prd = np.asarray(jax.device_get(st.box.prd))
        img = np.asarray(jax.device_get(st.image))[valid]
        xu = np.asarray(jax.device_get(st.x))[valid] + img * prd
        vc = s.get_compute("vc")
        am = s.get_compute("am")
        rg = s.get_compute("rg")
        nmol = mol.max()
        assert vc.shape == (nmol, 3)
        for c in (1, nmol):
            sel = mol == c
            M = m[sel].sum()
            vref = (m[sel, None] * v[sel]).sum(0) / M
            np.testing.assert_allclose(vc[c - 1], vref, rtol=1e-12,
                                       atol=1e-14)
            com = (m[sel, None] * xu[sel]).sum(0) / M
            rel = xu[sel] - com
            lref = (m[sel, None] * np.cross(rel, v[sel])).sum(0)
            np.testing.assert_allclose(am[c - 1], lref, rtol=1e-10,
                                       atol=1e-12)
            rgref = np.sqrt((m[sel] * (rel ** 2).sum(-1)).sum() / M)
            assert rg[c - 1] == pytest.approx(rgref, rel=1e-12)


class TestLocals:
    def test_angle_local_theta(self, water):
        s = water
        s.one("compute al all angle/local theta")
        th = np.atleast_1d(s.get_compute("al"))
        # rigid-geometry water data file: all angles at the TIP3P value
        assert th.shape[0] > 0
        np.testing.assert_allclose(th, 104.52, atol=0.5)

    def test_property_local_bonds(self, water):
        s = water
        s.one("compute pb all property/local btype batom1 batom2")
        out = np.atleast_2d(s.get_compute("pb"))
        top = s.sim.forcefield.topology
        nb = int((np.asarray(top.bonds)[:, 0] > 0).sum())
        assert out.shape == (nb, 3)
        assert np.all(out[:, 0] == 1)

    def test_dihedral_local_runs(self):
        # melt has no dihedrals: empty result, no crash
        s = melt()
        s.one("compute dl all dihedral/local phi")
        assert np.asarray(s.get_compute("dl")).size == 0


class TestSliceAndHeatFlux:
    def test_slice(self):
        s = melt()
        s.one("compute ct all count/type atom")
        s.one("compute sl all slice 1 1 1 c_ct")
        assert s.get_compute("sl").tolist() == [108]

    def test_heat_flux_convective_only_matches(self):
        s = melt()
        s.one("compute ka all ke/atom")
        s.one("compute pa all pe/atom")
        s.one("compute sa all stress/atom NULL")
        s.one("compute hf all heat/flux ka pa sa")
        out = s.get_compute("hf")
        assert out.shape == (6,)
        v, m, _ = _vmg(s)
        valid = np.asarray(jax.device_get(s.sim.state.valid_mask))

        def pa(a):
            a = np.atleast_1d(np.asarray(a))
            return a[valid] if a.shape[0] == len(valid) else a

        ke = pa(s.get_compute("ka"))
        pe = pa(s.get_compute("pa"))
        jc = ((ke + pe)[:, None] * v).sum(0)
        np.testing.assert_allclose(out[3:], jc, rtol=1e-10)
        assert np.all(np.isfinite(out))


class TestAcosSafeGradient:
    def test_collinear_angle_force_finite_f32(self):
        """Near-collinear angles must exert large-but-FINITE forces: in
        f32 a plain epsilon-clip of cos(theta) rounds to exactly +-1 and
        autodiffs to NaN (r5 rhodo-mix blowup root cause). The reference
        floors s = sqrt(1-c^2) at SMALL=0.001 (angle_charmm.cpp)."""
        from lammps_kokkos_port_tpu.models import bonded

        ang = bonded.AngleCharmm(
            k=jnp.array([0.0, 50.0], jnp.float32),
            theta0=jnp.array([0.0, np.radians(113.0)], jnp.float32),
            k_ub=jnp.array([0.0, 5.0], jnp.float32),
            r_ub=jnp.array([0.0, 2.5], jnp.float32))
        g = jax.grad(lambda d1, d2: ang.energy_one(d1, d2, 1),
                     argnums=(0, 1))
        for eps in (1e-2, 1e-4, 0.0):
            d1 = jnp.array([1.1, 0.0, 0.0], jnp.float32)
            d2 = jnp.array([-1.1, eps, 0.0], jnp.float32)
            g1, g2 = g(d1, d2)
            assert bool(jnp.isfinite(g1).all()), eps
            assert bool(jnp.isfinite(g2).all()), eps
        # and the floor matches the reference: a normal angle's force is
        # untouched (s >= 0.001 there)
        d1 = jnp.array([1.1, 0.0, 0.0], jnp.float64)
        d2 = jnp.array([-0.5, 1.0, 0.0], jnp.float64)
        g64 = jax.grad(lambda a, b: ang.energy_one(
            a.astype(jnp.float32), b.astype(jnp.float32), 1).astype(
            jnp.float64), argnums=0)(d1, d2)
        assert bool(jnp.isfinite(g64).all())
