"""thermo_style multi / yaml rendering (ref: src/thermo.cpp:74-85 MULTI/
YAML keyword lines, FORMAT_MULTI_HEADER banner, format() MULTILINE/
YAMLLINE field layout)."""

import re

from lammps_kokkos_port_tpu.script import LammpsScript

DECK = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
neighbor 0.3 bin
neigh_modify delay 0 every 20 check no
fix 1 all nve
thermo 5
"""


def _run(style_line):
    s = LammpsScript()
    for ln in (DECK + style_line + "\nrun 5\n").strip().splitlines():
        if ln.strip():
            s.one(ln)
    return "\n".join(s._log_lines)


def test_multi_banner_and_fields():
    out = _run("thermo_style multi")
    # banner per thermo step, no column-header line
    banners = re.findall(r"^-+ Step\s+\d+ ----- CPU =\s+[\d.eE+-]+ \(sec\) "
                         r"-+$", out, re.M)
    assert len(banners) == 2  # step 0 and step 5
    assert "Step Temp" not in out
    # the fixed MULTI keyword set, three fields per line
    for name in ("TotEng", "KinEng", "Temp", "PotEng", "E_bond", "E_angle",
                 "E_dihed", "E_impro", "E_vdwl", "E_coul", "E_long",
                 "Press"):
        assert re.search(rf"^{name}\s*=\s*-?[\d.]+", out, re.M) or \
            re.search(rf"{name}\s*=\s*-?[\d.]+", out), name
    # field lines carry exactly three `=` (last line of each block irregular
    # only if nfield % 3 != 0; MULTI has 12 fields -> all lines have 3)
    field_lines = [ln for ln in out.splitlines()
                   if re.match(r"^(TotEng|PotEng|E_dihed|E_coul)\s+=", ln)]
    assert field_lines and all(ln.count("=") == 3 for ln in field_lines)


def test_yaml_document():
    out = _run("thermo_style yaml")
    assert "---" in out
    m = re.search(r"keywords: \[(.*)\]", out)
    assert m and m.group(1).startswith("'Step', 'Temp', 'KinEng'")
    rows = re.findall(r"^  - \[.*\]$", out, re.M)
    assert len(rows) == 2
    # every row has 12 comma-separated values
    assert all(len(r.split(",")) == 12 for r in rows)


def test_one_still_default():
    out = _run("thermo_style one")
    assert "Step Temp E_pair" in out
