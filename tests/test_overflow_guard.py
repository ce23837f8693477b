"""Overflow must be impossible to ignore (the Kokkos resize-retry
contract: results of an overflowed neighbor build are never consumed,
ref: src/KOKKOS/npair_kokkos.cpp:225-330,536-540).

The raw segment runner NaN-poisons its returned positions when the sticky
overflow flag is set at segment end, so any consumer that bypasses the
Simulation grow-retry loop (as bench.py once did) gets loud non-finite
output rather than silently corrupt physics. The product path
(Simulation.run / _run_segment_retry) checks the flag first, discards the
poisoned state, grows capacities, and re-runs — these tests pin both
sides of that contract.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from lammps_kokkos_port_tpu.presets import lj_melt_sim


def _undersized_sim(list_mode="auto"):
    sim = lj_melt_sim(cells=5, t_init=1.44, seed=87287, dtype=jnp.float32,
                      every=5, delay=0, check=False, list_mode=list_mode)
    sim.setup()
    # shrink capacities below the real occupancy and rebuild: the build
    # clamps and sets the sticky overflow flag
    p = sim.nl.params
    small = dataclasses.replace(p, cell_cap=max(2, p.cell_cap // 8),
                                K=max(2, p.K // 64))
    sim.nl = sim._build_list(sim.state, small)
    if not bool(jax.device_get(sim.nl.overflow)):
        pytest.skip("could not provoke overflow at this size")
    return sim


def test_raw_runner_overflow_poisons():
    sim = _undersized_sim()
    runner = sim._get_segment_runner()
    st, nl = runner(sim.state, sim.nl, 3)
    assert bool(jax.device_get(nl.overflow))
    # positions must be NaN-poisoned — raw-runner overflow cannot pass
    # silently into a timed/consumed trajectory
    assert not bool(jax.device_get(jnp.all(jnp.isfinite(st.x))))


def test_healed_path_recovers():
    sim = _undersized_sim()
    # the product path grows capacity, rebuilds, re-runs — and the result
    # is finite with the overflow flag clear
    sim._check_overflow_and_grow()
    sim._run_segment_retry(5)
    assert not bool(jax.device_get(sim.nl.overflow))
    assert bool(jax.device_get(jnp.all(jnp.isfinite(
        jnp.where(sim.state.valid_mask[:, None], sim.state.x, 0.0)))))


def test_retry_heals_midsegment_overflow():
    """Even when the undersized list is handed straight to the retry loop
    (overflow set at entry), the segment result is healed, not poisoned."""
    sim = _undersized_sim()
    sim._run_segment_retry(5)
    assert not bool(jax.device_get(sim.nl.overflow))
    row = sim.thermo()
    assert all(jnp.isfinite(v) for k, v in row.items()
               if isinstance(v, float))
