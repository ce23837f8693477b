"""Timing / profiling: per-phase breakdown + Finish-style report.

TPU-native equivalent of the reference's Timer + Finish
(ref: src/timer.h:23-44 section enum, src/finish.cpp:127-460 report). The
fused jit step has no internal section boundaries by design — XLA owns the
schedule — so profiling runs each phase as its own jitted callable with
block_until_ready walls (the jax analog of `timer->stamp(Timer::X)`), plus
an optional jax.profiler trace for kernel-level detail.

Also provides the wall-clock guard of `timer timeout` (ref: src/timer.h:66)
via Simulation.run on_thermo callbacks.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def profile_simulation(sim, nsteps: int = 60, repeats: int = 3) -> dict:
    """Measure per-phase costs (force / neighbor build / integrate / thermo)
    and a steady-state step rate; returns the breakdown dict."""
    if sim.nl is None:
        sim.setup()
    st, nl = sim.state, sim.nl

    def timeit(fn, *args, n=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    force = jax.jit(lambda s, l: sim.force_fn(s, l, False, False)[0])
    t_force = timeit(force, st, nl)

    build = jax.jit(lambda s: sim._build_list(s, nl.params).xhold)
    t_build = timeit(build, st, n=3)

    integ = jax.jit(sim.integrator.initial_integrate)
    t_integ = timeit(integ, st)

    t_thermo = timeit(lambda: sim.thermo(), n=2)

    runner = sim._get_segment_runner()
    s2, l2 = runner(st, nl, nsteps)
    jax.block_until_ready(s2.x)
    t0 = time.perf_counter()
    s2, l2 = runner(s2, l2, nsteps)
    jax.block_until_ready(s2.x)
    t_loop = (time.perf_counter() - t0) / nsteps

    n = int(jax.device_get(st.nlocal))
    every = max(nl.params.every, 1)
    return {
        "natoms": n,
        "per_step_s": t_loop,
        "atom_steps_per_s": n / t_loop,
        "force_s": t_force,
        "neigh_build_s": t_build,
        "neigh_amortized_s": t_build / every,
        "integrate_s": t_integ,
        "thermo_s": t_thermo,
        "list_mode": sim.list_mode,
    }


def finish_report(sim, nsteps: int, loop_time: float) -> str:
    """End-of-run performance summary (ref: Finish::end, src/finish.cpp)."""
    n = int(jax.device_get(sim.state.nlocal))
    rate = nsteps / max(loop_time, 1e-12)
    lines = [
        f"Loop time of {loop_time:.6g} on {len(jax.devices())} device(s) "
        f"for {nsteps} steps with {n} atoms",
        f"Performance: {rate:,.3f} timesteps/s, "
        f"{n * rate / 1e6:,.3f} Matom-step/s",
    ]
    if sim.nl is not None:
        lines.append(
            f"Neighbor builds: {int(jax.device_get(sim.nl.nbuilds))} "
            f"(list mode: {sim.list_mode})"
        )
    return "\n".join(lines)


def trace(path: str):
    """Context manager: capture a jax profiler trace viewable in
    TensorBoard/Perfetto (the Kokkos-Tools hook analog)."""
    return jax.profiler.trace(path)
