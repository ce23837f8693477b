"""K-space electrostatics tests: Ewald vs the NaCl Madelung constant
(absolute physics golden) and PPPM vs Ewald (method consistency)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.core.box import Box
from lammps_kokkos_port_tpu.core.state import create_state
from lammps_kokkos_port_tpu.models.ewald import Ewald
from lammps_kokkos_port_tpu.models.pair_charmm import PairCoul
from lammps_kokkos_port_tpu.models.pppm import PPPM
from lammps_kokkos_port_tpu.ops import neighbor as nbr

MADELUNG_NACL = 1.747564594633182  # per ion pair at unit nn distance


def nacl_state(cells=2, dtype=jnp.float64):
    """Rock-salt alternating +-1 charges on a unit simple-cubic lattice."""
    L = cells * 2
    pts = []
    qs = []
    for i in range(L):
        for j in range(L):
            for k in range(L):
                pts.append([i, j, k])
                qs.append(1.0 if (i + j + k) % 2 == 0 else -1.0)
    box = Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64)
    return create_state(
        np.asarray(pts, dtype=float), box, charges=np.asarray(qs),
        units_name="lj", dtype=dtype,
    )


def random_salt_state(n=40, L=7.0, seed=3, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, L, (n, 3))
    q = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    box = Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64)
    return create_state(x, box, charges=q, units_name="lj", dtype=dtype)


def real_space(state, rc, g):
    pair = PairCoul.create(1, rc, g_ewald=g, coul_mode="long")
    p = nbr.size_for_system(state, cutneigh=rc + 0.3, skin=0.3)
    nl = nbr.build(state, p)
    while bool(nl.overflow):
        p = nbr.grow(p)
        nl = nbr.build(state, p)
    f, e, v = pair.compute(state, nl, True, True)
    return f, e, v


class TestEwald:
    def test_nacl_madelung(self):
        st = nacl_state(cells=2)
        g = 2.0
        rc = 3.0
        f_r, e_r, _ = real_space(st, rc, g)
        ew = Ewald.create(st.box, g, accuracy_rel=1e-8)
        f_k, e_k, v_k = ew.compute(st, True, True)
        n = int(st.nlocal)
        e_total = float(e_r + e_k)
        want = -(n / 2) * MADELUNG_NACL
        assert e_total == pytest.approx(want, rel=1e-6)
        # forces vanish by symmetry
        assert np.abs(np.asarray(f_r + f_k)[:n]).max() < 1e-8

    def test_ewald_g_independence(self):
        # total energy must not depend on the splitting parameter
        st = random_salt_state()
        totals = []
        for g, rc in ((1.0, 3.4), (1.4, 2.8)):
            f_r, e_r, _ = real_space(st, rc, g)
            ew = Ewald.create(st.box, g, accuracy_rel=1e-10)
            f_k, e_k, _ = ew.compute(st, True, True)
            totals.append(float(e_r + e_k))
        assert totals[0] == pytest.approx(totals[1], rel=1e-6)

    def test_forces_match_energy_gradient_total(self):
        # real+kspace force on atoms = -grad of total energy: check via FD
        st = random_salt_state(n=16, L=6.0)
        g = 1.3
        rc = 2.8
        ew = Ewald.create(st.box, g, accuracy_rel=1e-10)

        def etot(x):
            s2 = st.replace(x=x)
            f_r, e_r, _ = real_space(s2, rc, g)
            _, e_k, _ = ew.compute(s2, True, False)
            return e_r + e_k

        f_r, _, _ = real_space(st, rc, g)
        f_k, _, _ = ew.compute(st, True, False)
        f = np.asarray(f_r + f_k)
        # central differences on a few atoms
        h = 1e-5
        x0 = np.asarray(st.x)
        for i in (0, 5, 11):
            for d in range(3):
                xp = x0.copy(); xp[i, d] += h
                xm = x0.copy(); xm[i, d] -= h
                fd = -(float(etot(jnp.asarray(xp))) - float(etot(jnp.asarray(xm)))) / (2 * h)
                assert f[i, d] == pytest.approx(fd, rel=2e-4, abs=1e-6)


class TestPPPM:
    def test_nacl_madelung_and_convergence(self):
        st = nacl_state(cells=2)
        g = 2.0
        rc = 3.0
        f_r, e_r, _ = real_space(st, rc, g)
        n = int(st.nlocal)
        want = -(n / 2) * MADELUNG_NACL
        errs = []
        for grid in ((16,) * 3, (32,) * 3):
            pm = PPPM.create(st.box, g, grid=grid, order=5)
            _, e_k, _ = pm.compute(st, True, False)
            errs.append(abs(float(e_r + e_k) - want) / abs(want))
        assert errs[0] < 5e-4
        assert errs[1] < 5e-6  # mesh refinement converges to the exact sum

    def test_matches_ewald_random_system(self):
        st = random_salt_state(n=40, L=7.0)
        g = 1.4
        rc = 2.8
        ew = Ewald.create(st.box, g, accuracy_rel=1e-10)
        pm = PPPM.create(st.box, g, grid=(24, 24, 24), order=5)
        f_e, e_e, _ = ew.compute(st, True, False)
        f_p, e_p, _ = pm.compute(st, True, False)
        n = int(st.nlocal)
        assert float(e_p) == pytest.approx(float(e_e), rel=2e-4)
        fe = np.asarray(f_e)[:n]
        fp = np.asarray(f_p)[:n]
        scale = np.abs(fe).max()
        np.testing.assert_allclose(fp, fe, atol=2e-3 * scale)
