"""Neighbor engine tests: cell-list matrix vs brute-force O(N^2) goldens
(SURVEY.md §7 build order stage 2)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.core.box import Box
from lammps_kokkos_port_tpu.core.state import create_state
from lammps_kokkos_port_tpu.ops import neighbor as nbr


def brute_force_pairs(x, box, cutoff):
    """Set of (i, j) pairs within cutoff under minimum image."""
    x = np.asarray(x)
    n = len(x)
    dx = x[:, None, :] - x[None, :, :]
    dx = np.asarray(box.min_image(jnp.asarray(dx)))
    r2 = (dx**2).sum(-1)
    cut2 = cutoff * cutoff
    pairs = set()
    for i in range(n):
        for j in range(n):
            if i != j and r2[i, j] < cut2:
                pairs.add((i, j))
    return pairs


def nl_pairs(nl, n):
    idx = np.asarray(nl.idx)
    cap = idx.shape[0]
    pairs = set()
    for i in range(n):
        for j in idx[i]:
            if j < cap:
                pairs.add((i, int(j)))
    return pairs


def make_random_state(rng, n, L, dtype=jnp.float64):
    box = Box.create([0, 0, 0], [L, L, L], dtype=dtype)
    x = rng.uniform(0, L, (n, 3))
    return create_state(x, box, dtype=dtype)


class TestCellList:
    @pytest.mark.parametrize("n,L,cut", [(64, 8.0, 2.0), (200, 10.0, 2.5)])
    def test_matches_bruteforce(self, rng, n, L, cut):
        st = make_random_state(rng, n, L)
        p = nbr.size_for_system(st, cutneigh=cut, skin=0.3)
        assert not p.all_pairs
        # sizing is an estimate; the grow-retry loop is part of the contract
        nl = nbr.build(st, p)
        while bool(nl.overflow):
            p = nbr.grow(p)
            nl = nbr.build(st, p)
        got = nl_pairs(nl, n)
        want = brute_force_pairs(st.x[:n], st.box, cut)
        assert got == want

    def test_allpairs_fallback_small_box(self, rng):
        # box too small for 3 cells per dim -> all-pairs mode
        st = make_random_state(rng, 30, 4.0)
        p = nbr.size_for_system(st, cutneigh=2.0, skin=0.3)
        assert p.all_pairs
        nl = nbr.build(st, p)
        got = nl_pairs(nl, 30)
        want = brute_force_pairs(st.x[:30], st.box, 2.0)
        assert got == want

    def test_padding_atoms_excluded(self, rng):
        box = Box.create([0, 0, 0], [10.0, 10.0, 10.0], dtype=jnp.float64)
        x = rng.uniform(0, 10, (37, 3))  # pads to 40
        st = create_state(x, box, dtype=jnp.float64, pad_multiple=8)
        p = nbr.size_for_system(st, cutneigh=3.0, skin=0.3)
        nl = nbr.build(st, p)
        idx = np.asarray(nl.idx)
        # no neighbor entry may reference a padded atom
        real = idx[idx < st.capacity]
        assert np.all(real < 37)
        # padded rows are empty
        assert np.all(idx[37:] == st.capacity)

    def test_overflow_detected_and_growth_fixes(self, rng):
        st = make_random_state(rng, 150, 9.0)
        p0 = nbr.size_for_system(st, cutneigh=3.0, skin=0.3)
        small = dataclasses.replace(p0, K=4)
        nl = nbr.build(st, small)
        assert bool(nl.overflow)
        grown = nbr.grow(small)
        while bool(nbr.build(st, grown).overflow):
            grown = nbr.grow(grown)
        nl2 = nbr.build(st, grown)
        got = nl_pairs(nl2, 150)
        want = brute_force_pairs(st.x[:150], st.box, 3.0)
        assert got == want

    def test_needs_rebuild_check_policy(self, rng):
        st = make_random_state(rng, 64, 10.0)
        p = nbr.size_for_system(st, cutneigh=2.5, skin=1.0, every=1, delay=0, check=True)
        nl = nbr.build(st, p)
        # no motion -> no rebuild
        assert not bool(nbr.needs_rebuild(st, nl))
        # move one atom farther than half the skin -> rebuild
        x2 = st.x.at[5, 0].add(0.6)
        assert bool(nbr.needs_rebuild(st.replace(x=x2), nl))

    def test_needs_rebuild_every_policy(self, rng):
        st = make_random_state(rng, 64, 10.0)
        p = nbr.size_for_system(
            st, cutneigh=2.5, skin=0.3, every=20, delay=0, check=False
        )
        nl = nbr.build(st, p)
        for i in range(19):
            assert not bool(nbr.needs_rebuild(st, nl)), i
            nl = nbr.tick(nl)
        assert bool(nbr.needs_rebuild(st, nl))

    def test_triclinic_matches_bruteforce(self, rng):
        box = Box.create(
            [0, 0, 0], [9.0, 9.0, 9.0], tilt=[1.0, -0.8, 1.2], dtype=jnp.float64
        )
        # generate points inside the tilted cell
        lam = rng.uniform(0, 1, (120, 3))
        x = np.asarray(box.to_box(jnp.asarray(lam)))
        st = create_state(x, box, dtype=jnp.float64)
        p = nbr.size_for_system(st, cutneigh=2.5, skin=0.3)
        nl = nbr.build(st, p)
        got = nl_pairs(nl, 120)
        want = brute_force_pairs(st.x[:120], st.box, 2.5)
        assert got == want
