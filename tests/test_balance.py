"""Load balancing: weighted slab cuts (ref: src/balance.cpp, src/rcb.cpp;
dynamic rebalance = fix balance, src/fix_balance.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lammps_kokkos_port_tpu.core.box import Box
from lammps_kokkos_port_tpu.core.state import create_state
from lammps_kokkos_port_tpu.models.forcefield import from_pair
from lammps_kokkos_port_tpu.models.pair_lj import make_lj_cut
from lammps_kokkos_port_tpu.parallel.domain import ShardedMD


def skewed_state(n=None, seed=4):
    """Lattice sites kept with probability falling in x: piled toward low
    x so uniform slabs are badly imbalanced, but no overlapping pairs
    (random placement would blow up the LJ core and teleport atoms)."""
    rng = np.random.default_rng(seed)
    Lx, Lyz = 40.0, 6.0
    a = 1.25
    g = np.mgrid[0:int(Lx / a), 0:int(Lyz / a), 0:int(Lyz / a)]
    pts = (g.reshape(3, -1).T + 0.5) * a
    keep = rng.uniform(size=len(pts)) < (1.0 - 0.9 * pts[:, 0] / Lx)
    xyz = pts[keep] + rng.uniform(-0.05, 0.05, (keep.sum(), 3))
    box = Box.create([0, 0, 0], [Lx, Lyz, Lyz], dtype=jnp.float64)
    st = create_state(xyz, box, types=np.ones(len(xyz), np.int32),
                      masses=np.array([1.0, 1.0]), units_name="lj",
                      dtype=jnp.float64)
    v = 0.05 * rng.standard_normal((len(xyz), 3))
    return st.replace(v=st.v.at[:len(xyz)].set(jnp.asarray(v)))


def make_smd(state, balance):
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    pair = make_lj_cut(1, {(1, 1): (1.0, 1.0)}, cut_global=2.5,
                       dtype=jnp.float64)
    return ShardedMD(state, from_pair(pair), mesh=mesh, skin=0.3,
                     rebuild_every=5, balance=balance)


class TestBalance:
    def test_weighted_cuts_reduce_imbalance(self):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        state = skewed_state()
        uni = make_smd(state, balance=False)
        bal = make_smd(state, balance=True)
        iu, ib = uni.imbalance(), bal.imbalance()
        assert ib < iu, (iu, ib)
        assert ib < 1.3, ib  # quantile cuts land near-even counts

    def test_balanced_run_matches_uniform(self):
        """Same trajectory regardless of the decomposition (cuts are a
        parallelization detail, not physics)."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        state = skewed_state()
        uni = make_smd(state, balance=False)
        bal = make_smd(state, balance=True)
        uni.run(10)
        bal.run(10)
        gu, gb = uni.gather(), bal.gather()
        np.testing.assert_array_equal(gu["tag"], gb["tag"])
        np.testing.assert_allclose(gu["x"], gb["x"], atol=1e-11)

    def test_dynamic_rebalance(self):
        """rebalance() re-cuts mid-run and the trajectory stays consistent
        with the never-rebalanced run."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        state = skewed_state()
        a = make_smd(state, balance=True)
        b = make_smd(state, balance=True)
        a.run(10)
        b.run(5)
        b.rebalance()
        b.run(5)
        ga, gb = a.gather(), b.gather()
        np.testing.assert_array_equal(ga["tag"], gb["tag"])
        np.testing.assert_allclose(ga["x"], gb["x"], atol=1e-10)
