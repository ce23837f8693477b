"""slab_half_force_pallas (big-N streamed Newton-half kernel) parity.

The 1M-atom path: forces from the slab-streamed kernel must equal the
whole-grid column kernel / matrix engine, including the halo-reaction
folds across slab boundaries and the wrap-copy plane (both the S | nx
and the padded S-does-not-divide-nx configurations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.ops import pallas_pair
from lammps_kokkos_port_tpu.presets import lj_melt_sim


def _forces(sim):
    valid = np.asarray(jax.device_get(sim.state.valid_mask))
    tags = np.asarray(jax.device_get(sim.state.tag))[valid]
    order = np.argsort(tags)
    return np.asarray(jax.device_get(sim.state.f))[valid][order]


@pytest.mark.parametrize("limit,cells", [(1, 8), (10000, 12)])
def test_slab_half_matches_matrix(monkeypatch, limit, cells):
    # limit=1 forces S=1 (plane-at-a-time streaming); the (10000, 12)
    # case gives S=3 on a 7-plane grid -> exercises the padded-ext path
    ref = lj_melt_sim(cells=cells, t_init=1.44, seed=87287, dtype=jnp.float64,
                      every=5, delay=0, check=False)
    ref._list_mode_req = "matrix"
    ref.setup()
    ref._run_segment_retry(12)

    monkeypatch.setattr(pallas_pair, "_VMEM_ROW_LIMIT", limit)
    zw = lj_melt_sim(cells=cells, t_init=1.44, seed=87287, dtype=jnp.float64,
                     every=5, delay=0, check=False)
    zw._list_mode_req = "sorted"
    zw.setup()
    p = zw.nl.params
    assert zw.state.capacity > limit  # really on the slab path
    if limit == 10000:
        S = min(p.ncells[0],
                max(1, (limit // 2) // (p.ncells[1] * p.ncells[2]
                                        * p.cell_cap)))
        assert p.ncells[0] % S != 0  # padded-ext configuration
    zw._run_segment_retry(12)
    assert not bool(jax.device_get(zw.nl.overflow))

    f_ref = _forces(ref)
    f_zw = _forces(zw)
    np.testing.assert_allclose(f_zw, f_ref, rtol=1e-9, atol=1e-10)
