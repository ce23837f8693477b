"""Benchmarks: the reference's bench decks re-run on TPU.

Primary metric (the ONE JSON line, last stdout line): 32k-atom LJ melt
(bench/in.lj equivalent), atom-steps/s. Baseline = 1.41 M atom-steps/s
(reference LAMMPS, 1 CPU core, icc 2016, bench/log.6Oct16.lj.fixed.icc.1;
see BASELINE.md). Secondary configs (stderr): 1M-atom LJ, 32k-atom EAM
(bench/in.eam equivalent), plus a VPU roofline estimate for the LJ kernel.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_LJ = 1.41e6   # bench/log.6Oct16.lj.fixed.icc.1
BASELINE_EAM = 0.536e6  # bench/log.6Oct16.eam.fixed.icc.1
NSTEPS = 100
T_INIT = 1.44
SEED = 87287


def assert_healthy(nl, what, state=None):
    """A timed segment must never have overflowed NOR gone non-finite:
    overflowed physics is corrupt (clamped neighbor data), and a NaN/inf
    trajectory runs the same ops on garbage (r5 lesson: the r4 rhodo
    number was measured on a trajectory that had silently blown up — the
    overflow check alone cannot see that). The product path heals
    overflow by grow+rerun; non-finite state raises."""
    if bool(jax.device_get(nl.overflow)):
        raise RuntimeError(
            f"{what}: neighbor capacity overflow during a timed segment "
            "— the measurement would be on corrupt physics")
    if state is not None and not bool(
            jax.device_get(jnp.isfinite(state.x).all())):
        raise RuntimeError(
            f"{what}: non-finite positions — the trajectory blew up; "
            "the measurement would be on NaN physics")


def run_rate(sim, nsteps=NSTEPS):
    """Steady-state atom-steps/s, slope-measured over two segment lengths
    so the fixed host<->device sync cost cancels.

    Measures the SAME overflow-healed path users get: warmup advances
    through Simulation._run_segment_retry (growing capacities if the melt
    densifies any cell past its cap), and every timed segment asserts the
    sticky overflow flag stayed clear."""
    sim.setup()
    natoms = int(jax.device_get(sim.state.nlocal))
    # warmup through the healing path: any capacity growth happens here
    sim._run_segment_retry(nsteps)
    sim._run_segment_retry(3 * nsteps)
    runner = sim._get_segment_runner()

    def timed(k):
        s, l = runner(sim.state, sim.nl, k)
        float(jnp.sum(s.x))  # warm compile + full sync
        assert_healthy(l, f"warm k={k}", s)
        t0 = time.perf_counter()
        s, l = runner(sim.state, sim.nl, k)
        float(jnp.sum(s.x))
        dt = time.perf_counter() - t0
        assert_healthy(l, f"timed k={k}", s)
        return dt

    k2 = 3 * nsteps
    t1, t2 = timed(nsteps), timed(k2)
    per_step = (t2 - t1) / (k2 - nsteps)
    return natoms / per_step, natoms, per_step


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from lammps_kokkos_port_tpu.presets import eam_bulk_cu_sim, lj_melt_sim

    extra = {}

    # -- primary: LJ melt 32k (bench/in.lj) -------------------------------
    sim = lj_melt_sim(cells=20, t_init=T_INIT, seed=SEED, dtype=jnp.float32,
                      every=20, delay=0, check=False)
    lj_rate, lj_n, lj_step = run_rate(sim)
    log(f"lj-32k [{sim.list_mode}]: {lj_rate/1e6:.1f} M atom-steps/s "
        f"({lj_step*1e3:.3f} ms/step)")

    # roofline note: ~14*cell_cap candidates/atom (Newton-halved column
    # kernel) x ~25 VPU ops each
    p = sim.nl.params
    cands = 14 * p.cell_cap
    ops = lj_n * cands * 25
    log(f"lj-32k kernel roofline: ~{cands} candidates/atom -> "
        f"{ops*1e-9/ (lj_step*1e3):.2f} T-op/s achieved vs ~2.5 T-op/s "
        f"VPU f32 (dense-candidate design; see ops/pallas_pair.py)")
    extra["lj_32k_ms_per_step"] = round(lj_step * 1e3, 4)

    # -- secondary: LJ 1M atoms -------------------------------------------
    try:
        sim = lj_melt_sim(cells=63, t_init=T_INIT, seed=SEED,
                          dtype=jnp.float32, every=20, delay=0, check=False)
        r, n, st = run_rate(sim)
        log(f"lj-1m [{sim.list_mode}] ({n} atoms): {r/1e6:.1f} M atom-steps/s "
            f"({st*1e3:.2f} ms/step)")
        extra["lj_1m_atom_steps_per_sec"] = round(r)
    except Exception as e:  # noqa: BLE001 — secondary config must not kill the run
        log(f"lj-1m failed: {e}")

    # -- secondary: EAM Cu 32k (bench/in.eam) ------------------------------
    # Pallas two-sweep dense path (ops/pallas_eam) over Chebyshev-resampled
    # tables; force err < 2e-3 rel / energy < 1e-5 rel vs the exact spline
    # path (pinned in tests/test_eam.py TestEAMDense/TestEAMPallas; the
    # spline path stays the default for golden-log parity)
    try:
        sim = eam_bulk_cu_sim(cells=20, dtype=jnp.float32)
        sim._list_mode_req = "sorted"
        r, n, st = run_rate(sim)
        log(f"eam-32k [{sim.list_mode} pallas]: {r/1e6:.2f} M atom-steps/s "
            f"({st*1e3:.2f} ms/step), vs CPU baseline "
            f"{r/BASELINE_EAM:.1f}x")
        extra["eam_32k_atom_steps_per_sec"] = round(r)
    except Exception as e:  # noqa: BLE001
        log(f"eam-32k failed: {e}")

    # -- secondary: granular chute 32k (bench/in.chute) ---------------------
    # baseline 5.99 M atom-steps/s = bench/log.6Oct16.chute.fixed.icc.1
    # (1 CPU core, 2016). The dense grid engine (ops/grangrid) OOMs the
    # TPU compile: its [ntot, cc, 27, cc, 3] shear tensors pad ~25x under
    # the (8,128) tiling (r5 root-cause of the r3/r4 "compiler crash" —
    # 19.7 GB padded vs 0.94 GB logical); until the lane-major granular
    # rewrite lands, the [N,K] matrix engine provides the honest TPU
    # number (gather-bound, ~1.3 M)
    try:
        import os as _os

        from lammps_kokkos_port_tpu.script import LammpsScript

        cwd = _os.getcwd()
        _os.chdir("/root/reference/bench")
        try:
            s = LammpsScript(dtype=jnp.float32, list_mode="matrix")
            deck = open("in.chute").read().replace(
                "run             100", "run 0")
            for ln in deck.strip().splitlines():
                s.one(ln)
        finally:
            _os.chdir(cwd)
        sim = s.sim
        n = int(jax.device_get(sim.state.nlocal))
        sim._run_segment_retry(100)  # warmup through the healing path
        runner = sim._get_segment_runner()

        def timed(k):
            st, l = runner(sim.state, sim.nl, k)
            jax.block_until_ready(st.x)
            assert_healthy(l, f"chute warm k={k}", st)
            t0 = time.perf_counter()
            st, l = runner(sim.state, sim.nl, k)
            jax.block_until_ready(st.x)
            dt = time.perf_counter() - t0
            assert_healthy(l, f"chute timed k={k}", st)
            return dt

        t1, t2 = timed(100), timed(300)
        per = (t2 - t1) / 200
        r = n / per
        log(f"chute-32k [matrix]: {r/1e6:.2f} M atom-steps/s "
            f"({per*1e3:.2f} ms/step), vs CPU baseline {r/5.99e6:.1f}x")
        extra["chute_32k_atom_steps_per_sec"] = round(r)
    except Exception as e:  # noqa: BLE001
        log(f"chute-32k failed: {e}")

    # -- secondary: rhodo-class 32k (water + CH2 chains, FULL style stack:
    # CHARMM bond/angle/dihedral/improper + 1-4 + mass-SHAKE + PPPM + NPT,
    # term ratios matching log.6Oct16.rhodo.fixed.icc.1) -------------------
    # baseline 0.341 M atom-steps/s = bench/log.6Oct16.rhodo.fixed.icc.4
    # (4 CPU cores, 2016); the reference data file is stripped, so the
    # system is synthesized at the same scale (benchmarks/make_rhodo_mix).
    #
    # r5 protocol notes: the r3/r4 "TPU compiler fault at k>20" was in
    # fact the TRAJECTORY going non-finite ~22 steps from the raw
    # synthesized configuration (diagnosed via benchmarks/prof; the old
    # bench never checked finiteness, so the r4 number was measured on a
    # blown-up trajectory). Known-fixed along the way: f32 NaN in
    # near-collinear angle forces (models/bonded._acos_safe custom JVP).
    # STATUS: even after quench-relax + stepped re-thermalization at
    # timestep 1.0, the synthesized system still goes non-finite around
    # 150-200 K — REPRODUCED IDENTICALLY in f64 on CPU (same failure
    # stage/temperature), so this is a property of the synthetic
    # structure / force-field combination, not precision or TPU. Until
    # the generator produces a dynamically stable packing (or the real
    # data.rhodo is obtained), this section reports 'failed' rather than
    # publish a NaN-physics number. Timed segments are LONG FUSED scans
    # (k=100/300) with finiteness asserted.
    try:
        import os as _os
        import sys as _sys
        import tempfile as _tf

        _sys.path.insert(0, _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), "benchmarks"))
        from make_rhodo_mix import write_data

        from lammps_kokkos_port_tpu.script import LammpsScript

        with _tf.TemporaryDirectory() as td:
            data = _os.path.join(td, "data.rhodo-mix")
            write_data(data)  # 31,950 atoms, 51.6k dihedrals
            deck = open(_os.path.join(
                _os.path.dirname(_os.path.abspath(__file__)),
                "benchmarks", "in.rhodo-mix")).read()
            deck = deck.replace("read_data       data.rhodo-mix",
                                f"read_data       {data}")
            deck = deck.replace("run             100", "run 0")
            deck = deck.replace("timestep        2.0", "timestep        1.0")
            s = LammpsScript(dtype=jnp.float32, list_mode="molcell")
            for ln in deck.strip().splitlines():
                s.one(ln)
        sim = s.sim
        n = int(jax.device_get(sim.state.nlocal))
        runner = sim._get_segment_runner()

        # quench-relax: repeated zero-velocity 8-step segments let the
        # synthesized contacts relax under SHAKE
        st, l = sim.state, sim.nl
        for _ in range(12):
            st = st.replace(v=jnp.zeros_like(st.v))
            st, l = runner(st, l, 8)
        # stepped thermalization toward 300 K
        sim.state, sim.nl = st, l
        for t_target in (50.0, 150.0, 300.0):
            row = sim.thermo()
            scale = (t_target / max(row["temp"], 1e-3)) ** 0.5
            sim.state = sim.state.replace(v=sim.state.v * scale)
            stt, ltt = runner(sim.state, sim.nl, 40)
            assert_healthy(ltt, f"rhodo thermalize {t_target}K", stt)
            sim.state, sim.nl = stt, ltt

        def timed(k):
            st, l = runner(sim.state, sim.nl, k)
            jax.block_until_ready(st.x)
            assert_healthy(l, f"rhodo warm k={k}", st)
            t0 = time.perf_counter()
            st, l = runner(sim.state, sim.nl, k)
            jax.block_until_ready(st.x)
            dt = time.perf_counter() - t0
            assert_healthy(l, f"rhodo timed k={k}", st)
            return dt

        t1, t2 = timed(100), timed(300)
        per = (t2 - t1) / 200
        r = n / per
        log(f"rhodo-32k [molcell full-charmm+pppm+shake+npt]: {r/1e6:.3f} M "
            f"atom-steps/s ({per*1e3:.2f} ms/step), vs CPU baseline "
            f"{r/0.341e6:.1f}x")
        extra["rhodo_32k_atom_steps_per_sec"] = round(r)
    except Exception as e:  # noqa: BLE001
        log(f"rhodo-32k failed: {e}")

    # -- 10k-step energy drift (BASELINE.json second metric) ----------------
    try:
        sim = lj_melt_sim(cells=20, t_init=T_INIT, seed=SEED,
                          dtype=jnp.float32, every=20, delay=0, check=False)
        sim.setup()
        e0 = sim.thermo()["etotal"]
        # through the overflow-healed product path (Simulation.run
        # semantics): any cell-capacity overflow grows and re-runs the
        # segment from its snapshot instead of timing corrupt physics
        for _ in range(100):
            sim._run_segment_retry(100)
        assert_healthy(sim.nl, "drift 10k")
        e1 = sim.thermo()["etotal"]
        log(f"lj-32k 10k-step etotal drift: {e1 - e0:+.3e} per atom "
            f"(f32, overflow-healed path)")
        extra["lj_32k_drift_10k"] = e1 - e0
    except Exception as e:  # noqa: BLE001
        log(f"drift measurement failed: {e}")

    print(json.dumps({
        "metric": "lj_melt_32k_atom_steps_per_sec",
        "value": lj_rate,
        "unit": "atom-steps/s",
        "vs_baseline": lj_rate / BASELINE_LJ,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
