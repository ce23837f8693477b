"""Fork RBC membrane styles (SURVEY.md §2.11): bond wlc_pow_all_visc,
angle area_volume3, dihedral bend2 — force/energy consistency on a closed
octahedron membrane plus an interpreter-level smoke run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.core.box import Box
from lammps_kokkos_port_tpu.core.state import create_state
from lammps_kokkos_port_tpu.core.topology import pad_topology
from lammps_kokkos_port_tpu.models import rbc

F64 = jnp.float64


def octa_membrane(scale=1.0, center=(5.0, 5.0, 5.0), jitter=0.0, seed=0):
    """Closed octahedron: 6 vertices, 8 outward-wound triangles, 12 edge
    bonds, 12 bend dihedrals (one per edge, the two triangles sharing it)."""
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], dtype=float) * scale
    x = v + np.asarray(center)
    if jitter:
        rng = np.random.default_rng(seed)
        x = x + rng.normal(scale=jitter, size=x.shape)
    # outward-facing winding: normal of (i1,i2,i3) = (x2-x1)x(x3-x1) points
    # away from the center
    tris = []
    for a, b in ((0, 2), (2, 1), (1, 3), (3, 0)):
        tris.append((a, b, 4))   # top cap
        tris.append((b, a, 5))   # bottom cap
    tris = np.array(tris)
    edges = set()
    for t in tris:
        for i in range(3):
            e = tuple(sorted((t[i], t[(i + 1) % 3])))
            edges.add(e)
    edges = np.array(sorted(edges))
    # bend dihedral per edge: (i1, e0, e1, i4) with i1/i4 the opposite
    # vertices of the two adjacent triangles
    dihs = []
    for e0, e1 in edges:
        opp = []
        for t in tris:
            s = set(t)
            if e0 in s and e1 in s:
                opp.append((s - {e0, e1}).pop())
        dihs.append((opp[0], e0, e1, opp[1]))
    return x, tris, edges, np.array(dihs)


def make_state(x, aux_x0=True):
    box = Box.create([0, 0, 0], [10.0, 10.0, 10.0], dtype=F64)
    st = create_state(np.asarray(x), box,
                      types=np.ones(len(x), np.int32),
                      masses=np.array([1.0, 1.0]),
                      molecules=np.ones(len(x), np.int32),
                      units_name="lj", dtype=F64)
    if aux_x0:
        st = st.replace(aux={**st.aux, "x0": st.x})
    return st


class TestBondWLC:
    def _style_top(self, x, edges, gamc=0.0, gamt=0.0, temp=0.1, dt=0.01):
        st = make_state(x)
        top = pad_topology(st.capacity,
                           bonds=np.column_stack(
                               [np.ones(len(edges), np.int32), edges]))
        style = rbc.make_bond_wlc_pow_all_visc(
            1, {1: (temp, 2.2, 100.0, 2.0, gamc, gamt)}, dt=dt, dtype=F64)
        return st, top, style

    def test_force_is_energy_gradient_deterministic_limit(self):
        """With gamc=gamt=0 the stochastic/viscous terms vanish and the
        WLC+POW force must equal -dE/dr along the bond
        (ref: bond_wlc_pow_all_visc.cpp:142 vs :146-150)."""
        x, tris, edges, dihs = octa_membrane(scale=1.3)
        st, top, style = self._style_top(x, edges)
        f, e, vir = style.compute(st, top, True, True)
        f = np.asarray(f)

        # numeric dE/dx of vertex 0
        eps = 1e-6
        for dim in range(3):
            xp = x.copy()
            xp[0, dim] += eps
            stp = make_state(xp, aux_x0=False)
            stp = stp.replace(aux={**stp.aux, "x0": st.aux["x0"]})
            xm = x.copy()
            xm[0, dim] -= eps
            stm = make_state(xm, aux_x0=False)
            stm = stm.replace(aux={**stm.aux, "x0": st.aux["x0"]})
            _, ep, _ = style.compute(stp, top, True, False)
            _, em, _ = style.compute(stm, top, True, False)
            want = -(float(ep) - float(em)) / (2 * eps)
            np.testing.assert_allclose(f[0, dim], want, rtol=1e-5, atol=1e-8)

    def test_newton_third_law_and_noise_scale(self):
        """Stochastic term: forces stay pairwise antisymmetric (fi = -fj)
        so momentum is conserved even with noise on."""
        x, tris, edges, dihs = octa_membrane(scale=1.3)
        st, top, style = self._style_top(x, edges, gamc=1.0, gamt=0.5)
        f, _, _ = style.compute(st, top, False, False)
        valid = np.asarray(jax.device_get(st.valid_mask))
        np.testing.assert_allclose(np.asarray(f)[valid].sum(axis=0), 0.0,
                                   atol=1e-10)


class TestAngleAreaVolume3:
    def _style(self, v0_scale=1.0, ka=0.0, kv=0.0, kl=0.0, press=0.0,
               scale=1.2):
        x, tris, edges, dihs = octa_membrane(scale=scale)
        st = make_state(x)
        top = pad_topology(st.capacity,
                           angles=np.column_stack(
                               [np.ones(len(tris), np.int32), tris]))
        # octahedron with vertex distance s: V = 4/3 s^3, A = 2 sqrt(3) s^2
        V = 4.0 / 3.0 * scale**3
        A = 4.0 * np.sqrt(3.0) * scale**2
        style = rbc.make_angle_area_volume3(
            1, {1: (ka, A, kv, V * v0_scale, kl, 0.0, press, 1.0, 0.0,
                    0, 1, 1.0)}, nmol=1, dtype=F64)
        return st, top, style, V, A

    def test_volume_and_area_reduction(self):
        """The segment-summed area/volume match the analytic octahedron
        values (divergence-theorem volume, ref: angle_area_volume3.cpp:214)."""
        st, top, style, V, A = self._style(kv=1.0)
        ang = top.angles
        t, i1 = ang[:, 0], ang[:, 1]
        f, e, vir = style.compute(st, top, True, True)
        # recompute the reductions the style uses
        x = np.asarray(st.x)
        tris = np.asarray(ang[t > 0][:, 1:4])
        n = np.cross(x[tris[:, 1]] - x[tris[:, 0]],
                     x[tris[:, 2]] - x[tris[:, 0]])
        area = 0.5 * np.linalg.norm(n, axis=1).sum()
        vol = (n * (x[tris[:, 0]] + x[tris[:, 1]] + x[tris[:, 2]])).sum() / 18
        np.testing.assert_allclose(area, A, rtol=1e-12)
        np.testing.assert_allclose(vol, V, rtol=1e-12)

    def test_volume_restoring_force(self):
        """v0 > V -> the kv term inflates the membrane (outward radial
        forces); v0 < V deflates it; net force is zero either way."""
        for v0s, sign in ((1.3, +1.0), (0.7, -1.0)):
            st, top, style, V, A = self._style(kv=5.0, v0_scale=v0s)
            f, _, _ = style.compute(st, top, False, False)
            f = np.asarray(f)
            x = np.asarray(st.x)
            valid = np.asarray(jax.device_get(st.valid_mask))
            center = x[valid].mean(axis=0)
            radial = ((x[valid] - center) * f[valid]).sum(axis=1)
            assert np.all(sign * radial > 0), (v0s, radial)
            np.testing.assert_allclose(f[valid].sum(axis=0), 0.0, atol=1e-10)

    def test_local_area_zero_at_reference(self):
        """kl energy vanishes when x == x0 and pulls back after stretch."""
        st, top, style, V, A = self._style(kl=3.0)
        f, e, _ = style.compute(st, top, True, False)
        assert float(e) == pytest.approx(0.0, abs=1e-12)
        np.testing.assert_allclose(np.asarray(f)[:6], 0.0, atol=1e-12)


class TestDihedralBend2:
    def test_zero_at_reference_and_restoring(self):
        """At x == x0 the spontaneous-angle bending energy and forces are
        exactly zero (ref: dihedral_bend2.cpp:240 E = k(1-cos(dtheta)));
        perturbing a vertex produces a net-zero-force restoring field."""
        x, tris, edges, dihs = octa_membrane(scale=1.2)
        st = make_state(x)
        top = pad_topology(st.capacity,
                           dihedrals=np.column_stack(
                               [np.ones(len(dihs), np.int32), dihs]))
        style = rbc.make_dihedral_bend2(1, {1: (2.0, 0.0)}, dtype=F64)
        f, e, vir = style.compute(st, top, True, True)
        assert float(e) == pytest.approx(0.0, abs=1e-12)
        np.testing.assert_allclose(np.asarray(f)[:6], 0.0, atol=1e-10)

        xp = x.copy()
        xp[4] = xp[4] + np.array([0.0, 0.0, 0.4])  # pull the apex up
        stp = make_state(xp, aux_x0=False)
        stp = stp.replace(aux={**stp.aux, "x0": st.aux["x0"]})
        fp, ep, _ = style.compute(stp, top, True, False)
        fp = np.asarray(fp)
        assert float(ep) > 0.0
        assert fp[4, 2] < 0.0  # restoring: pushes the apex back down
        valid = np.asarray(jax.device_get(stp.valid_mask))
        np.testing.assert_allclose(fp[valid].sum(axis=0), 0.0, atol=1e-9)

    def test_force_is_energy_gradient(self):
        """bend2 is conservative: explicit forces must match -dE/dx
        numerically at a bent configuration."""
        x, tris, edges, dihs = octa_membrane(scale=1.2)
        xb = x.copy()
        xb[4] = xb[4] + np.array([0.1, -0.05, 0.3])
        st0 = make_state(x)  # x0 = perfect octahedron
        top = pad_topology(st0.capacity,
                           dihedrals=np.column_stack(
                               [np.ones(len(dihs), np.int32), dihs]))
        style = rbc.make_dihedral_bend2(1, {1: (1.5, 0.0)}, dtype=F64)

        def at(xc):
            s = make_state(xc, aux_x0=False)
            return s.replace(aux={**s.aux, "x0": st0.aux["x0"]})

        f, _, _ = style.compute(at(xb), top, False, False)
        f = np.asarray(f)
        eps = 1e-6
        for vtx in (2, 4):
            for dim in range(3):
                xp = xb.copy()
                xp[vtx, dim] += eps
                xm = xb.copy()
                xm[vtx, dim] -= eps
                _, ep_, _ = style.compute(at(xp), top, True, False)
                _, em_, _ = style.compute(at(xm), top, True, False)
                want = -(float(ep_) - float(em_)) / (2 * eps)
                np.testing.assert_allclose(f[vtx, dim], want,
                                           rtol=2e-5, atol=1e-7)


class TestRBCScript:
    def test_membrane_deck_runs(self):
        """A full RBC membrane (all three styles together) integrates
        stably through the interpreter for 50 steps."""
        from lammps_kokkos_port_tpu.script import LammpsScript

        x, tris, edges, dihs = octa_membrane(scale=1.2)
        s = LammpsScript(dtype=F64)
        for line in [
            "units lj",
            "dimension 3",
            "boundary p p p",
            "region box block 0 10 0 10 0 10",
            "create_box 1 box",
            "mass 1 1.0",
        ]:
            s.one(line)
        # inject the membrane directly (the data-file path is exercised by
        # molecular tests; here we go through the setup API)
        s.positions = [tuple(p) for p in x]
        s.types = [1] * len(x)
        s.molecules = [1] * len(x)
        s.nbondtypes = 1
        s.nangletypes = 1
        s.ndihedraltypes = 1
        s.topology_raw = {
            "bonds": np.column_stack(
                [np.ones(len(edges), np.int32), edges + 1]),
            "angles": np.column_stack(
                [np.ones(len(tris), np.int32), tris + 1]),
            "dihedrals": np.column_stack(
                [np.ones(len(dihs), np.int32), dihs + 1]),
            "impropers": None,
        }
        V = 4.0 / 3.0 * 1.2**3
        A = 4.0 * np.sqrt(3.0) * 1.2**2
        for line in [
            "bond_style wlc_pow_all_visc",
            "bond_coeff 1 0.05 2.2 100.0 2.0 1.0 0.3",
            "angle_style area_volume3",
            f"angle_coeff 1 50.0 {A} 50.0 {V} 20.0 0 0 1.0 0 0 1 1.0",
            "dihedral_style bend2",
            "dihedral_coeff 1 5.0 0.0",
            "pair_style zero 2.0",
            "pair_coeff * *",
            "special_bonds lj/coul 1.0 1.0 1.0",
            "velocity all create 0.02 12345",
            "timestep 0.005",
            "fix 1 all nve",
            "thermo 25",
            "run 50",
        ]:
            s.one(line)
        xf = np.asarray(s.sim.state.x)[:6]
        assert np.all(np.isfinite(xf))
        # membrane held together: vertices stay within ~2x the original size
        c = xf.mean(axis=0)
        assert np.all(np.linalg.norm(xf - c, axis=1) < 3.0)


class TestRBCOracle:
    def test_octa_membrane_reference_golden(self):
        """Reference-binary oracle: a 6-vertex octahedron membrane
        (8 triangles, 12 WLC bonds, 12 bend dihedrals) read from a
        full/sph/x0image data file, integrated 100 NVE steps with
        bond wlc/pow/all/visc (gamc=gamt=0: deterministic elastic limit),
        angle area/volume3 (global area+volume + local-area + x0
        triangles), dihedral bend2. Positions/velocities pinned to the
        reference binary's 17-digit dump within fp64 roundoff.

        Also pins the data_atom_post semantics: the reference OVERWRITES
        the data file's x0 columns with the read-time positions
        (atom_vec_full_sph_x0image.cpp:375-377), so the rest shape is
        x-at-read, not the x0 columns.
        """
        import os

        from lammps_kokkos_port_tpu.script import LammpsScript

        gold_dir = os.path.join(os.path.dirname(__file__), "goldens", "rbc")
        deck = f"""
units           lj
dimension       3
boundary        p p p
atom_style      full/sph/x0image
read_data       {os.path.join(gold_dir, "data.octa")}
bond_style      wlc/pow/all/visc
bond_coeff      1 0.05 2.2 100.0 2.0 0.0 0.0
angle_style     area/volume3
angle_coeff     1 50.0 9.9766126516841089 50.0 2.304 20.0 0 0 1.0 0 0 1 1.0
dihedral_style  bend2
dihedral_coeff  1 5.0 0.0
pair_style      zero 2.0
pair_coeff      * *
special_bonds   lj/coul 1.0 1.0 1.0
fix             1 all nve
timestep        0.005
run             100
"""
        s = LammpsScript(dtype=jnp.float64)
        for ln in deck.strip().splitlines():
            s.one(ln)
        st = s.sim.state
        valid = np.asarray(st.valid_mask)
        order = np.argsort(np.asarray(st.tag)[valid])
        x = np.asarray(st.x)[valid][order]
        v = np.asarray(st.v)[valid][order]

        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_sph import _read_dump_frames

        gold = _read_dump_frames(os.path.join(gold_dir, "octa_100.dump"))[100]
        L = 10.0
        dxw = x - gold[:, 2:5]
        dxw -= L * np.round(dxw / L)
        assert np.abs(dxw).max() < 1e-12
        np.testing.assert_allclose(v, gold[:, 5:8], atol=1e-12, rtol=0)
