"""Granular contact mechanics vs a reference-binary golden.

A 6-sphere mini-chute (3 frozen bottom spheres, 3 spheres falling under
chute-angled gravity, fs z-boundary) is run 5000 steps through the full
deck path: pair gran/hooke/history (Hookean contact + shear-history
friction + torque), fix gravity chute, fix freeze, fix nve/sphere, and
neighbor rebuilds that carry the per-contact shear across list epochs.
The golden (goldens/gran/final.oracle.data) was produced by the reference
binary (built from /root/reference with PKG_GRANULAR) running the same
deck; our trajectory matches positions/velocities/omega to ~5e-13 after
5000 steps spanning several contact events.

The full bench/in.chute deck (32000 atoms) reproduces the reference's
committed log.6Oct16.chute thermo: KinEng to all 8 printed digits at
steps 0..100 and rotational KE (c_1) to ~7 digits — granular friction has
a Coulomb-threshold branch, so roundoff-order differences can flip one
near-threshold contact, which bounds digit-exactness at this scale.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

GOLD_DIR = os.path.join(os.path.dirname(__file__), "goldens", "gran")

DECK = """
units           lj
atom_style      sphere
boundary        p p fs
newton          off
comm_modify     vel yes
read_data       {data}
pair_style      gran/hooke/history 200000.0 NULL 50.0 NULL 0.5 0
pair_coeff      * *
neighbor        0.1 bin
neigh_modify    every 1 delay 0
timestep        0.0001
group           bottom type 2
group           active subtract all bottom
fix             1 all gravity 1.0 chute 26.0
fix             2 bottom freeze
fix             3 active nve/sphere
run             5000
"""


def _load_golden(path):
    X, V, OM = {}, {}, {}
    sec = None
    for ln in open(path).read().splitlines():
        s = ln.split("#")[0].strip()
        if not s:
            continue
        w = s.split()
        if s in ("Atoms", "Velocities", "Masses") or s.endswith("Coeffs"):
            sec = s
            continue
        if sec == "Atoms":
            X[int(w[0])] = [float(w[4]), float(w[5]), float(w[6])]
        elif sec == "Velocities":
            V[int(w[0])] = [float(w[1]), float(w[2]), float(w[3])]
            OM[int(w[0])] = [float(w[4]), float(w[5]), float(w[6])]
    n = max(X)
    idx = range(1, n + 1)
    return (np.array([X[i] for i in idx]), np.array([V[i] for i in idx]),
            np.array([OM[i] for i in idx]))


@pytest.mark.slow
def test_chute_bench_thermo():
    """bench/in.chute (32000 spheres, 100 steps) vs the reference's
    committed log.6Oct16.chute.fixed.icc.1: KinEng exact to the printed
    8 digits; rotational KE within friction-threshold roundoff."""
    import os as _os

    from lammps_kokkos_port_tpu.script import LammpsScript

    deck = "/root/reference/bench/in.chute"
    if not _os.path.exists(deck):
        pytest.skip("reference bench deck unavailable")
    cwd = _os.getcwd()
    _os.chdir("/root/reference/bench")
    try:
        s = LammpsScript(dtype=jnp.float64)
        s.file(deck)
    finally:
        _os.chdir(cwd)
    sim = s.sim
    row = sim.thermo()
    ke = row["ke"]  # norm no -> extensive
    assert ke == pytest.approx(784292.08, rel=5e-8)
    ero = s.get_compute("1")
    assert ero == pytest.approx(1571.0968, rel=1e-5)


def test_gran_hooke_history_mini_chute():
    from lammps_kokkos_port_tpu.script import LammpsScript

    s = LammpsScript(dtype=jnp.float64)
    for ln in DECK.format(data=os.path.join(GOLD_DIR, "data.mini")) \
            .strip().splitlines():
        s.one(ln)
    st = s.sim.state
    tags = np.asarray(st.tag)
    valid = np.asarray(st.valid_mask)
    order = np.argsort(tags[valid])
    x = np.asarray(st.x)[valid][order]
    v = np.asarray(st.v)[valid][order]
    om = np.asarray(st.aux["omega"])[valid][order]
    wx, wv, wom = _load_golden(os.path.join(GOLD_DIR, "final.oracle.data"))
    np.testing.assert_allclose(x, wx, atol=1e-10, rtol=0)
    np.testing.assert_allclose(v, wv, atol=1e-10, rtol=0)
    np.testing.assert_allclose(om, wom, atol=1e-10, rtol=0)


def test_grid_engine_matches_matrix(tmp_path):
    """The dense grid granular engine (ops/grangrid: rolls + slot-space
    shear + elementwise rebuild remap) vs the [N,K] matrix engine on the
    mini chute: same directed-edge math, so trajectories agree to
    accumulation-order roundoff over a run with rebuilds."""
    from lammps_kokkos_port_tpu.runner import Simulation
    from lammps_kokkos_port_tpu.script import LammpsScript

    data = os.path.join(GOLD_DIR, "data.mini")
    deck = DECK.format(data=data).replace("run             5000",
                                          "run 800")

    def run_mode(mode):
        orig = Simulation._pick_list_mode
        if mode == "grid":
            def forced(self, params):
                self.list_mode = "grid"
            Simulation._pick_list_mode = forced
        try:
            s = LammpsScript(dtype=jnp.float64)
            for ln in deck.strip().splitlines():
                s.one(ln)
        finally:
            Simulation._pick_list_mode = orig
        sim = s.sim
        assert sim.list_mode == mode
        valid = np.asarray(sim.state.valid_mask)
        tag = np.asarray(sim.state.tag)[valid]
        order = np.argsort(tag)
        return (np.asarray(sim.state.x)[valid][order],
                np.asarray(sim.state.v)[valid][order],
                np.asarray(sim.state.aux["omega"])[valid][order],
                int(sim.nl.nbuilds) if hasattr(sim.nl, "nbuilds") else 0)

    xm, vm, om, _ = run_mode("matrix")
    xg, vg, og, nb = run_mode("grid")
    np.testing.assert_allclose(xg, xm, atol=1e-9)
    np.testing.assert_allclose(vg, vm, atol=1e-7)
    np.testing.assert_allclose(og, om, atol=1e-7)
