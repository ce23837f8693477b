"""Input-script interpreter tests: run actual deck text and check goldens,
plus restart round-trip and dump output."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_kokkos_port_tpu.script import LammpsScript, ScriptError

MELT_DECK = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 6 0 6 0 6
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 3.0 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
neigh_modify    every 20 delay 0 check no
fix             1 all nve
thermo          50
run             50
"""


def run_deck(text, dtype=jnp.float64, variables=None):
    s = LammpsScript(dtype=dtype, var_overrides=variables)
    for line in text.strip().splitlines():
        s.one(line)
    return s


class TestInterpreter:
    def test_melt_deck_step0_golden(self, capsys):
        s = run_deck(MELT_DECK)
        out = capsys.readouterr().out
        # step-0 row must match the reference exactly (864 atoms: intensive
        # quantities equal the 4000-atom golden at identical T/rho)
        line0 = [ln for ln in out.splitlines() if ln.strip().startswith("0 ")]
        assert line0, out
        vals = line0[0].split()
        assert float(vals[1]) == pytest.approx(3.0, abs=1e-9)
        assert float(vals[2]) == pytest.approx(-6.7733681, abs=1e-3)

    def test_variable_substitution(self):
        deck = """
variable        x index 2
variable        xx equal 3*$x
units           lj
lattice         fcc 0.8442
region          box block 0 ${xx} 0 ${xx} 0 ${xx}
create_box      1 box
create_atoms    1 box
mass            1 1.0
"""
        s = run_deck(deck)
        assert len(s.positions) == 4 * 6 ** 3

    def test_var_override_like_cli(self):
        deck = """
variable        n index 2
units           lj
lattice         fcc 0.8442
region          box block 0 $n 0 $n 0 $n
create_box      1 box
create_atoms    1 box
"""
        s = run_deck(deck, variables={"n": "3"})
        assert len(s.positions) == 4 * 27  # -var wins over index default

    def test_unknown_command_raises(self):
        with pytest.raises(ScriptError):
            run_deck("definitely_not_a_command 1 2 3")

    def test_unfix(self):
        s = LammpsScript()
        s.one("fix 1 all nve")
        s.one("fix 2 all langevin 1.0 1.0 1.0 1234")
        s.one("unfix 2")
        assert [f.fid for f in s.fixes] == ["1"]


class TestControlFlow:
    def test_loop_label_jump_next(self, tmp_path, capsys):
        deck = """
variable        i loop 3
label           top
print           "iter $i"
next            i
jump            SELF top
print           "done"
"""
        p = tmp_path / "in.loop"
        p.write_text(deck)
        s = LammpsScript(dtype=jnp.float64)
        s.file(str(p))
        out = capsys.readouterr().out
        assert out.count("iter") == 3
        assert "done" in out

    def test_if_elif_else(self, capsys):
        s = LammpsScript(dtype=jnp.float64)
        s.one('variable x equal 5')
        s.one('if "${x} < 3" then "print low" elif "${x} < 10" "print mid" '
              'else "print high"')
        assert "mid" in capsys.readouterr().out

    def test_include(self, tmp_path, capsys):
        inc = tmp_path / "inc.in"
        inc.write_text('print "from-include"\n')
        main = tmp_path / "main.in"
        main.write_text(f"include {inc}\n")
        s = LammpsScript(dtype=jnp.float64)
        s.file(str(main))
        assert "from-include" in capsys.readouterr().out

    def test_equal_var_with_thermo_keyword_is_lazy(self, capsys):
        s = run_deck(MELT_DECK.replace("run             50", "run 10")
                     + "\nvariable t2 equal 2*temp\nprint \"t=${t2}\"")
        out = capsys.readouterr().out
        row = s.sim.thermo()
        t_line = [ln for ln in out.splitlines() if ln.startswith("t=")][0]
        assert abs(float(t_line[2:]) - 2 * row["temp"]) < 1e-9

    def test_immediate_expression(self, capsys):
        s = LammpsScript(dtype=jnp.float64)
        s.one('print "$(sqrt(16)+1)"')
        assert "5" in capsys.readouterr().out


class TestMinimizeCommand:
    def test_minimize_lowers_energy(self):
        deck = MELT_DECK.replace("run             50",
                                 "minimize 0 1e-4 100 1000")
        s = run_deck(deck)
        row = s.sim.thermo()
        # fcc lattice at rho=0.8442 minimized: pe below the hot start
        assert row["pe"] < -6.7


class TestGroups:
    def test_region_group_mask_bits(self):
        deck = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
region          lhalf block 0 2 0 4 0 4
group           left region lhalf
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all nve
run             0
"""
        s = run_deck(deck)
        st = s.sim.state
        import jax

        mask = np.asarray(jax.device_get(st.mask))
        x = np.asarray(jax.device_get(st.x))
        n = int(jax.device_get(st.nlocal))
        bit = s.groups["left"]
        inx = mask[:n] & bit != 0
        lat = 1.6796 * 2  # fcc 0.8442 spacing * 2 cells
        assert inx.sum() > 0 and inx.sum() < n
        assert np.all(x[:n][inx][:, 0] <= lat + 1e-9)

    def test_subgroup_thermostat_leaves_rest_untouched(self):
        """fix nve on a sub-group: atoms outside the group must not move
        (ref: group.h:28 mask & groupbit gating in every fix)."""
        deck = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 3.0 87287 loop geom
group           movers id <= 100
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 movers nve
run             10
"""
        s = run_deck(deck)
        import jax

        st = s.sim.state
        x = np.asarray(jax.device_get(st.x))
        n = int(jax.device_get(st.nlocal))
        # non-members keep their lattice positions exactly
        from lammps_kokkos_port_tpu.core.lattice import Lattice, create_atoms
        lat = Lattice(style="fcc", scale=0.8442, units_name="lj")
        x0, _ = create_atoms(lat, np.zeros(3), np.array([4, 4, 4]) * lat.spacing,
                             type_id=1)
        moved = np.abs(x[:n] - x0).max(axis=1) > 1e-12
        assert moved[:100].any()
        assert not moved[100:].any()

    def test_velocity_group_create(self):
        deck = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
group           hot id <= 50
velocity        hot create 3.0 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
fix             1 all nve
run             0
"""
        s = run_deck(deck)
        import jax

        v = np.asarray(jax.device_get(s.sim.state.v))
        assert np.abs(v[:50]).max() > 0
        assert np.abs(v[50:int(jax.device_get(s.sim.state.nlocal))]).max() == 0


class TestRestartRoundtrip:
    def test_write_read(self, tmp_path):
        from lammps_kokkos_port_tpu.io.restart import read_restart, write_restart

        s = run_deck(MELT_DECK.replace("run             50",
                                       "run             10"))
        path = str(tmp_path / "rs.npz")
        write_restart(path, s.sim)
        st2 = read_restart(path)
        np.testing.assert_array_equal(np.asarray(st2.x),
                                      np.asarray(s.sim.state.x))
        np.testing.assert_array_equal(np.asarray(st2.v),
                                      np.asarray(s.sim.state.v))
        assert int(st2.ntimestep) == int(s.sim.state.ntimestep)
        assert st2.units_name == "lj"

    def test_resume_continues_identically(self, tmp_path):
        from lammps_kokkos_port_tpu.io.restart import read_restart, write_restart
        from lammps_kokkos_port_tpu.runner import Simulation

        # conservative rebuild policy: lists are always complete, so the
        # resumed run is bitwise-equivalent physics (with `check no` even the
        # reference's restarts diverge — rebuild phase differs)
        deck = MELT_DECK.replace("run             50", "run             10")
        deck = deck.replace("neigh_modify    every 20 delay 0 check no",
                            "neigh_modify    every 1 delay 0 check yes")
        s = run_deck(deck)
        path = str(tmp_path / "rs.npz")
        write_restart(path, s.sim)
        # continue original 10 more steps
        rows_a = s.sim.run(10)
        # resume from restart and run the same 10
        st = read_restart(path)
        sim2 = Simulation(
            st, s.sim.forcefield, dt=s.sim.dt, skin=s.sim.skin,
            neigh_every=s.sim.neigh_every, neigh_delay=s.sim.neigh_delay,
            neigh_check=s.sim.neigh_check,
        )
        sim2.setup()
        rows_b = sim2.run(10)
        assert rows_a[-1]["etotal"] == pytest.approx(rows_b[-1]["etotal"],
                                                     rel=1e-12)
        assert rows_a[-1]["temp"] == pytest.approx(rows_b[-1]["temp"],
                                                   rel=1e-10)


class TestDump:
    def test_dump_atom_and_xyz(self, tmp_path):
        from lammps_kokkos_port_tpu.io.dump import write_dump_frame

        s = run_deck(MELT_DECK.replace("run             50",
                                       "run             0"))
        p1 = str(tmp_path / "d.lammpstrj")
        write_dump_frame(p1, s.sim, style="atom")
        txt = open(p1).read()
        assert "ITEM: TIMESTEP" in txt and "ITEM: ATOMS id type xs ys zs" in txt
        assert len(txt.splitlines()) == 9 + 864
        p2 = str(tmp_path / "d.xyz")
        write_dump_frame(p2, s.sim, style="xyz")
        assert open(p2).readline().strip() == "864"

    def test_write_data_roundtrip(self, tmp_path):
        from lammps_kokkos_port_tpu.io.data_reader import read_data
        from lammps_kokkos_port_tpu.io.dump import write_data

        s = run_deck(MELT_DECK.replace("run             50",
                                       "run             0"))
        p = str(tmp_path / "out.data")
        write_data(p, s.sim)
        df = read_data(p, atom_style="atomic")
        assert df.natoms == 864
        from lammps_kokkos_port_tpu.core.state import atom_order

        x0 = np.asarray(s.sim.state.x)[atom_order(s.sim.state)]
        np.testing.assert_allclose(df.x, x0, atol=1e-12)
"""run 0 support check is implicit: run_deck with run 0 emits only step 0."""


class TestRegions:
    def test_sphere_region_create_atoms_and_group(self):
        """region sphere/cylinder + create_atoms region + group region
        (ref: src/region_sphere.cpp, src/create_atoms.cpp)."""
        import numpy as np

        s = LammpsScript(dtype=jnp.float64)
        for c in ["units lj", "lattice fcc 0.8442",
                  "region box block 0 6 0 6 0 6", "create_box 1 box",
                  "region ball sphere 3 3 3 2.0",
                  "create_atoms 1 region ball",
                  "mass 1 1.0"]:
            s.one(c)
        x = np.asarray(s.positions)
        sp = np.asarray(s.lattice.spacing)
        c = np.array([3.0, 3.0, 3.0]) * sp
        r = 2.0 * sp[0]
        d = np.linalg.norm(x - c, axis=1)
        assert len(x) > 50
        assert d.max() <= r + 1e-9
        s.one("region half block 0 3 0 6 0 6")
        inside = s._region_contains("half", x)
        assert 0 < inside.sum() < len(x)
        s.one("region tube cylinder z 3 3 1.5 0 6")
        t_in = s._region_contains("tube", x)
        r_t = 1.5 * sp[0]
        d2 = (x[:, 0] - c[0]) ** 2 + (x[:, 1] - c[1]) ** 2
        np.testing.assert_array_equal(t_in, d2 <= r_t * r_t)


class TestScheduledOutput:
    def test_scheduled_restart_files(self, tmp_path):
        """restart N file1 file2 alternates files; `*` takes the timestep
        (ref: src/output.cpp:189 restart scheduling)."""
        from lammps_kokkos_port_tpu.io.restart import read_restart

        f1 = str(tmp_path / "a.restart")
        f2 = str(tmp_path / "b.restart")
        deck = MELT_DECK.replace(
            "run             50",
            f"restart 10 {f1} {f2}\nrun             40")
        s = run_deck(deck)
        # steps 10,20,30,40 -> a(10), b(20), a(30), b(40)
        st_a = read_restart(f1)
        st_b = read_restart(f2)
        assert int(st_a.ntimestep) == 30
        assert int(st_b.ntimestep) == 40
        # wildcard form writes one file per checkpoint
        s2 = run_deck(MELT_DECK.replace(
            "run             50",
            f"restart 25 {tmp_path}/w.*.restart\nrun             50"))
        assert (tmp_path / "w.25.restart").exists()
        assert (tmp_path / "w.50.restart").exists()
        assert int(read_restart(str(tmp_path / "w.50.restart")).ntimestep) == 50

    def test_restart_zero_cancels(self, tmp_path):
        deck = MELT_DECK.replace(
            "run             50",
            f"restart 10 {tmp_path}/n.*.restart\nrestart 0\nrun 20")
        run_deck(deck)
        assert not list(tmp_path.glob("n.*"))

    def test_cpu_rate_thermo_keywords(self, capsys):
        """spcpu/tpcpu/cpuremain print real rates (were silently dropped;
        ref: src/thermo.cpp compute_spcpu)."""
        deck = MELT_DECK.replace(
            "thermo          50",
            "thermo          10\n"
            "thermo_style    custom step temp spcpu tpcpu cpuremain pxx pyy pzz")
        s = run_deck(deck)
        out = capsys.readouterr().out
        header = next(l for l in out.splitlines() if l.startswith("Step"))
        assert "S/CPU" in header and "T/CPU" in header and "CPULeft" in header
        assert "Pxx" in header
        rows = [l for l in out.splitlines()
                if l.strip() and l.split()[0].isdigit()]
        last = rows[-1].split()
        # spcpu positive on every row after the first; pxx finite
        assert float(last[2]) > 0
        import math
        assert all(math.isfinite(float(v)) for v in last[1:])


def test_tip4p_water_deck(tmp_path):
    """pair lj/cut/tip4p/cut through the interpreter on a TIP4P-style
    water box: M-site coulomb via autodiff (fixture-pinned physics in
    test_fixtures), NVE stays finite and near-conservative."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    from make_rhodo_water import write_data

    data = str(tmp_path / "data.w")
    write_data(data, nside=4)
    deck = f"""
units           real
atom_style      full
bond_style      harmonic
angle_style     charmm
pair_style      lj/cut/tip4p/cut 1 2 1 1 0.15 6.0
pair_modify     mix arithmetic
read_data       {data}
special_bonds   lj/coul 0.0 0.0 0.0
velocity        all create 300.0 4928 loop geom
fix             1 all nve
timestep        0.5
thermo          10
run             20
"""
    s = run_deck(deck)
    sim = s.sim
    import jax
    import numpy as np
    assert bool(np.isfinite(np.asarray(sim.state.x)).all())
    row = s._emit_thermo_row.__self__  # script alive
    # the style stack produced nonzero coulomb forces
    f = np.asarray(sim.state.f)
    valid = np.asarray(jax.device_get(sim.state.valid_mask))
    assert np.abs(f[valid]).max() > 0


def test_tip4p_long_pppm_deck(tmp_path):
    """lj/cut/tip4p/long + pppm/tip4p: k-space charge spreads from the M
    site; forces must equal -grad of the total M-site energy (checked by
    an autodiff cross-validation on the assembled force field)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    import jax
    import numpy as np
    from make_rhodo_water import write_data

    data = str(tmp_path / "data.w")
    write_data(data, nside=4)
    deck = f"""
units           real
atom_style      full
bond_style      harmonic
angle_style     charmm
pair_style      lj/cut/tip4p/long 1 2 1 1 0.15 5.0
pair_modify     mix arithmetic
kspace_style    pppm/tip4p 1e-4
read_data       {data}
special_bonds   lj/coul 0.0 0.0 0.0
velocity        all create 300.0 4928 loop geom
fix             1 all nve
timestep        0.5
run             5
"""
    s = run_deck(deck)
    sim = s.sim
    st, nl = sim.state, sim.nl
    f, _, _, _ = sim.force_fn(st, nl, False, False)

    def etot(x):
        _, epair, emol, _ = sim.forcefield.compute(
            st.replace(x=x), nl, True, False)
        return epair + emol

    f_ad = -jax.grad(etot)(st.x)
    valid = np.asarray(jax.device_get(st.valid_mask))
    np.testing.assert_allclose(np.asarray(f)[valid], np.asarray(f_ad)[valid],
                               atol=1e-8)


def _write_nacl_data(path, ncell=3, a=5.6402):
    """Rock-salt NaCl data file (atom_style charge, units real)."""
    basis_na = [(0, 0, 0), (0.5, 0.5, 0), (0.5, 0, 0.5), (0, 0.5, 0.5)]
    basis_cl = [(0.5, 0, 0), (0, 0.5, 0), (0, 0, 0.5), (0.5, 0.5, 0.5)]
    rows = []
    for i in range(ncell):
        for j in range(ncell):
            for k in range(ncell):
                for b in basis_na:
                    rows.append((1, 1.0, (i + b[0]) * a, (j + b[1]) * a,
                                 (k + b[2]) * a))
                for b in basis_cl:
                    rows.append((2, -1.0, (i + b[0]) * a, (j + b[1]) * a,
                                 (k + b[2]) * a))
    L = ncell * a
    with open(path, "w") as f:
        f.write("NaCl\n\n")
        f.write(f"{len(rows)} atoms\n2 atom types\n\n")
        f.write(f"0.0 {L} xlo xhi\n0.0 {L} ylo yhi\n0.0 {L} zlo zhi\n\n")
        f.write("Masses\n\n1 22.98977\n2 35.453\n\nAtoms\n\n")
        for n, (t, q, x, y, z) in enumerate(rows, 1):
            f.write(f"{n} {t} {q} {x} {y} {z}\n")


def test_msm_deck_matches_ewald(tmp_path):
    """kspace_style msm through the interpreter: total coulomb energy and
    forces on rock-salt NaCl agree with ewald at the accuracy target.

    MSM splits 1/r into gamma real-space + multilevel grid parts (ref:
    src/KSPACE/msm.cpp); ewald at 1e-6 is the oracle. LAMMPS accuracy
    1e-4 means force error ~1e-4 * qqr2e abs (kspace.cpp two_charge)."""
    import jax

    data = str(tmp_path / "data.nacl")
    _write_nacl_data(data)

    def coul_forces(pair_line, kspace_line):
        deck = f"""
units           real
atom_style      charge
{pair_line}
{kspace_line}
read_data       {data}
pair_coeff      * *
run             0
"""
        s = run_deck(deck)
        sim = s.sim
        f, epair, _, _ = sim.force_fn(sim.state, sim.nl, True, False)
        valid = np.asarray(jax.device_get(sim.state.valid_mask))
        return np.asarray(f)[valid], float(epair), sim.state

    f_ew, e_ew, st = coul_forces("pair_style      coul/long 8.0",
                                 "kspace_style    ewald 1e-6")
    f_msm, e_msm, _ = coul_forces("pair_style      coul/msm 8.0",
                                  "kspace_style    msm 1e-4")
    n = f_ew.shape[0]
    # Madelung sanity on the oracle: E/pair = -1.74756 * qqr2e / (a/2)
    e_pair = e_ew / (n / 2)
    assert abs(e_pair - (-1.747565 * 332.06371 / 2.8201)) < 0.05
    # MSM vs ewald: abs force tolerance ~ accuracy * two_charge_force
    assert np.abs(f_msm - f_ew).max() < 1e-4 * 332.06371 * 3
    assert abs(e_msm - e_ew) / abs(e_ew) < 2e-4
