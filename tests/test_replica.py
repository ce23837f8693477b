"""Replica parallelism: parallel tempering over a vmapped ensemble axis
(ref: src/REPLICA/temper.cpp; SURVEY.md §2.12.7)."""

import jax
import jax.numpy as jnp
import numpy as np

from lammps_kokkos_port_tpu.integrate.nh import FixNVT
from lammps_kokkos_port_tpu.parallel.replica import TemperEnsemble
from lammps_kokkos_port_tpu.presets import lj_melt_pair, lj_melt_state
from lammps_kokkos_port_tpu.runner import Simulation
from lammps_kokkos_port_tpu.utils.units import get_units


def small_sim(t=1.0):
    state = lj_melt_state(cells=3, t_init=t, dtype=jnp.float64)
    pair = lj_melt_pair(dtype=jnp.float64)
    units = get_units("lj")
    integ = FixNVT(dt=0.005, units=units, t_start=t, t_stop=t,
                   t_period=0.5)
    sim = Simulation(state, pair, dt=0.005, integrator=integ,
                     list_mode="matrix")
    sim.setup()
    return sim


class TestTemper:
    def test_ensemble_runs_and_swaps(self):
        """4 replicas at nearby temperatures: the vmapped ensemble advances,
        swap attempts accept at least once (close temps -> high acceptance),
        and each replica always holds exactly one of the ladder temps."""
        sim = small_sim(t=1.0)
        temps = [0.9, 1.0, 1.1, 1.2]
        ens = TemperEnsemble(sim, temps, seed=7)
        acc = ens.run(120, swap_every=30)
        held = sorted(ens.replica_temps())
        assert held == sorted(temps)  # temperatures permute, never clone
        rows = ens.thermo()
        assert len(rows) == 4
        assert all(np.isfinite(r["pe"]) for r in rows)
        assert acc >= 1  # nearby temps on identical configs swap readily

    def test_distinct_targets_thermostat(self):
        """Replicas thermostat toward their own aux t_target: after a run
        without swaps, the hot replica's temperature exceeds the cold
        one's."""
        sim = small_sim(t=1.0)
        ens = TemperEnsemble(sim, [0.5, 2.0], seed=3)
        ens.run(160, swap_every=10_000)  # no swap attempts
        rows = ens.thermo()
        assert rows[1]["temp"] > rows[0]["temp"], rows
