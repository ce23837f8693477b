"""Replay the reference's force-style golden YAML fixtures (SURVEY.md §4.1).

Each fixture pins fp64 per-atom forces, stress, and energies for a 29-atom
molecular system. Agreement here validates the style math, the special-bond
masking, mixing rules, and the virial tally in one shot.
"""

import numpy as np
import pytest

from fixture_harness import run_bonded_fixture, run_pair_fixture

RTOL = 1e-8


def check(got, want, has_coul=False, f_rtol=RTOL):
    scale = np.abs(want["forces"]).max()
    np.testing.assert_allclose(
        got["forces"], want["forces"], atol=scale * f_rtol, rtol=0
    )
    sscale = np.abs(want["stress"]).max()
    np.testing.assert_allclose(
        got["stress"], want["stress"], atol=sscale * 1e-8, rtol=0
    )


PAIR_FIXTURES = [
    "mol-pair-lj_cut.yaml",
    "mol-pair-lj_cut_coul_cut.yaml",
    "mol-pair-lj_cut_coul_long.yaml",
    "mol-pair-lj_charmm_coul_long.yaml",
    "mol-pair-coul_cut.yaml",
    "mol-pair-coul_long.yaml",
    "mol-pair-morse.yaml",
    "mol-pair-buck.yaml",
    "mol-pair-yukawa.yaml",
    "mol-pair-gauss.yaml",
]


@pytest.mark.parametrize("name", PAIR_FIXTURES)
def test_pair_fixture(name):
    got, want = run_pair_fixture(name)
    assert got["vdwl"] == pytest.approx(want["vdwl"], rel=1e-10, abs=1e-10)
    assert got["coul"] == pytest.approx(want["coul"], rel=1e-9, abs=1e-9)
    check(got, want)


BONDED_FIXTURES = [
    ("bond", "bond-harmonic.yaml"),
    ("bond", "bond-fene.yaml"),
    ("angle", "angle-harmonic.yaml"),
    ("angle", "angle-charmm.yaml"),
    ("angle", "angle-cosine.yaml"),
    ("dihedral", "dihedral-harmonic.yaml"),
    ("dihedral", "dihedral-opls.yaml"),
    ("improper", "improper-harmonic.yaml"),
]


@pytest.mark.parametrize("kind,name", BONDED_FIXTURES)
def test_bonded_fixture(kind, name):
    got, want = run_bonded_fixture(kind, name)
    assert got["energy"] == pytest.approx(want["energy"], rel=1e-9, abs=1e-9)
    check(got, want)


def test_dihedral_charmm_14_weights():
    """Nonzero 1-4 weights: total forces (pair lj/charmm/coul/charmm +
    torsion + weighted 1-4 LJ/coul) vs the reference golden
    (dihedral-charmm.yaml; ref: dihedral_charmm.cpp:245-281)."""
    from fixture_harness import run_dihedral_charmm_14_fixture

    got, want = run_dihedral_charmm_14_fixture()
    assert got["energy"] == pytest.approx(want["energy"], rel=1e-10)
    check(got, want)


MANYBODY_FIXTURES = [
    "manybody-pair-tersoff.yaml",
    "manybody-pair-sw.yaml",
    "manybody-pair-snap.yaml",  # hybrid/overlay zbl + snap
]


@pytest.mark.parametrize("name", MANYBODY_FIXTURES)
def test_manybody_fixture(name):
    from fixture_harness import run_manybody_fixture

    got, want = run_manybody_fixture(name)
    assert got["vdwl"] == pytest.approx(want["vdwl"], rel=1e-11)
    scale = np.abs(want["forces"]).max()
    np.testing.assert_allclose(got["forces"], want["forces"],
                               atol=scale * 1e-11, rtol=0)
    sscale = np.abs(want["stress"]).max()
    np.testing.assert_allclose(got["stress"], want["stress"],
                               atol=sscale * 1e-9, rtol=0)
