"""Replica parallelism: parallel tempering (the `temper` command).

TPU-native redesign of the reference's Universe/partition machinery
(ref: src/universe.cpp `-partition`, src/REPLICA/temper.cpp): instead of
splitting MPI_COMM_WORLD into worlds, the replica axis is a BATCH axis —
the whole state pytree is stacked `[R, ...]` and the jitted step is
`jax.vmap`-ed over it, so all replicas advance in one fused XLA program
on one chip (or sharded over a mesh axis by placing the batch axis on
devices). Swap attempts run host-side at segment boundaries, exactly the
reference's cadence (temper.cpp:189-310):

  boltz = (pe_i - pe_j) (1/kT_i - 1/kT_j);  accept if boltz >= 0 or
  uniform() < exp(boltz); on accept the TEMPERATURES migrate between
  replicas (aux["t_target"]) and velocities scale by sqrt(T_new/T_old)
  (Sugita scaling, temper.cpp:303,342).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..integrate.verlet import make_step


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


class TemperEnsemble:
    """R tempering replicas of one Simulation, advanced by a vmapped step.

    sim: a set-up single-replica Simulation (matrix list mode) whose
    integrator is an NVT-class thermostat; temps: target temperature per
    replica. Each replica starts from the same configuration but its own
    thermostat target (and optionally re-seeded velocities via vseeds).
    """

    def __init__(self, sim, temps, seed: int = 12345, vseeds=None):
        if sim.nl is None:
            sim.setup()
        self.sim = sim
        self.temps = [float(t) for t in temps]
        self.R = len(self.temps)
        self.rng = np.random.default_rng(seed)
        self.units = sim.units
        # replica->temperature-slot assignment (my_set_temp analog)
        self.temp_of = list(range(self.R))

        states = []
        for r, T in enumerate(self.temps):
            st = sim.state
            if vseeds is not None:
                from ..core.velocity import create_velocities

                v = create_velocities(
                    np.asarray(st.x[: int(jax.device_get(st.nlocal))]),
                    np.asarray(st.mass), np.asarray(st.type), T,
                    int(vseeds[r]), sim.units, dimension=st.dimension)
                vv = jnp.zeros_like(st.v).at[: len(v)].set(
                    jnp.asarray(v, st.dtype))
                st = st.replace(v=vv)
            st = st.replace(aux={**st.aux,
                                 "t_target": jnp.asarray(T, st.dtype)})
            states.append(st)
        self.state = _stack(states)
        self.nl = _stack([sim.nl] * self.R)
        self._cache = {}

    def _runner(self):
        key = self.sim.nl.params
        r = self._cache.get(key)
        if r is None:
            step = make_step(self.sim.integrator, self.sim.force_fn,
                             self.sim.fixes,
                             special=self.sim.forcefield.special)

            def seg(state, nl, nsteps: int):
                def body(carry, _):
                    return step(*carry), None

                (state, nl), _ = jax.lax.scan(body, (state, nl), None,
                                              length=nsteps)
                return state, nl

            def pe_of(state, nl):
                _, epair, emol, _ = self.sim.force_fn(state, nl, True, False)
                pe = epair if epair is not None else 0.0
                if emol is not None:
                    pe = pe + emol
                return pe

            r = (jax.jit(jax.vmap(seg, in_axes=(0, 0, None)),
                         static_argnums=2),
                 jax.jit(jax.vmap(pe_of)))
            self._cache[key] = r
        return r

    def run(self, nsteps: int, swap_every: int = 100):
        """Advance all replicas nsteps with swap attempts every swap_every
        steps. Returns the number of accepted swaps."""
        seg, pe_of = self._runner()
        accepted = 0
        done = 0
        while done < nsteps:
            k = min(swap_every, nsteps - done)
            self.state, self.nl = seg(self.state, self.nl, k)
            if bool(jnp.any(self.nl.overflow)):
                raise RuntimeError(
                    "temper: neighbor overflow — grow capacity and rerun")
            done += k
            if done < nsteps:
                accepted += self._attempt_swaps(pe_of, done)
        return accepted

    def _attempt_swaps(self, pe_of, iswap_step) -> int:
        pe = np.asarray(jax.device_get(pe_of(self.state, self.nl)))
        boltz = self.units.boltz
        # alternate even/odd adjacent pairing (temper.cpp:231-245)
        start = (iswap_step // 1) % 2
        naccept = 0
        temps = np.array([self.temps[self.temp_of[r]]
                          for r in range(self.R)])
        vscale = np.ones(self.R)
        for lo in range(start, self.R - 1, 2):
            i, j = lo, lo + 1  # replicas holding adjacent temperature slots
            bf = (pe[i] - pe[j]) * (1.0 / (boltz * temps[i])
                                    - 1.0 / (boltz * temps[j]))
            if bf >= 0.0 or self.rng.uniform() < np.exp(bf):
                naccept += 1
                self.temp_of[i], self.temp_of[j] = (self.temp_of[j],
                                                    self.temp_of[i])
                tnew_i = self.temps[self.temp_of[i]]
                tnew_j = self.temps[self.temp_of[j]]
                vscale[i] = np.sqrt(tnew_i / temps[i])
                vscale[j] = np.sqrt(tnew_j / temps[j])
        new_t = jnp.asarray([self.temps[self.temp_of[r]]
                             for r in range(self.R)],
                            dtype=self.sim.state.dtype)
        sc = jnp.asarray(vscale, dtype=self.sim.state.dtype)
        self.state = self.state.replace(
            v=self.state.v * sc[:, None, None],
            aux={**self.state.aux, "t_target": new_t})
        return naccept

    def replica_temps(self):
        return [self.temps[self.temp_of[r]] for r in range(self.R)]

    def thermo(self):
        """Per-replica (T, PE) table."""
        from ..compute import thermo as thermo_mod

        _, pe_of = self._runner()
        pe = np.asarray(jax.device_get(pe_of(self.state, self.nl)))
        temp = np.asarray(jax.device_get(jax.vmap(
            lambda s: thermo_mod.temperature(s, self.units))(self.state)))
        return [{"temp": float(t), "pe": float(p)}
                for t, p in zip(temp, pe)]
