"""Short-range coulomb variants + vdW/coulomb combination styles.

TPU-native equivalents of the reference's damped/screened coulomb family
and their Born/Buckingham combinations, all served by one generic
vdW + coulomb engine over the [N, K] neighbor matrix:

  coul/dsf     damped shifted-force (ref: src/pair_coul_dsf.cpp:98-135,
               Fennell & Gezelter JCP 124, 234104 (2006))
  coul/wolf    Wolf summation with self term (ref: src/pair_coul_wolf.cpp)
  coul/debye   screened coulomb (ref: src/pair_coul_debye.cpp:87-102)
  born[/coul/dsf|/coul/wolf]   Born-Mayer-Huggins vdW
               (ref: src/pair_born.cpp:117-133 + the combo sources)
  buck/coul/cut, buck/coul/long (ref: src/pair_buck_coul_cut.cpp,
               src/pair_buck_coul_long.cpp)

The dsf/wolf styles carry a per-atom SELF energy
(-(e_shift/2 + alpha/sqrt(pi)) q^2, tallied for every owned atom) — it
has no force but appears in ecoul exactly as the reference tallies it.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .pair import gather_pairs, tally_virial
from .pair_charmm import _qqrd2e, coul_cut_terms, coul_long_terms, erfc_ref

Array = jax.Array
MY_PIS = float(np.sqrt(np.pi))


def coul_dsf_terms(r2, qiqj, qqrd2e, alpha, cut_coul, factor_coul, eflag,
                   poly=True):
    """(forcecoul = F*r, ecoul). Per-pair terms use the A&S-polynomial
    erfc but the cutoff shift constants use the TRUE erfc — exactly the
    reference's split (compute: pair_coul_dsf.cpp:119,133; init_style
    shifts via libc erfc: :209-212)."""
    import math

    cut = cut_coul
    erfcd_c = math.exp(-alpha * alpha * cut * cut)
    erfcc_c = math.erfc(alpha * cut)
    f_shift = -(erfcc_c / (cut * cut) + 2.0 / MY_PIS * alpha * erfcd_c / cut)
    e_shift = erfcc_c / cut - f_shift * cut

    r = jnp.sqrt(r2)
    prefactor = qqrd2e * qiqj / r
    erfcd = jnp.exp(-alpha * alpha * r2)
    if poly:  # pair_coul_dsf.cpp uses the A&S polynomial per pair
        erfcc = erfc_ref(alpha * r) * erfcd
    else:  # born/coul/dsf uses MathSpecial::my_erfcx (true-erfc accuracy)
        from jax.scipy.special import erfc as erfc_t

        erfcc = erfc_t(alpha * r)
    forcecoul = prefactor * (erfcc / r + 2.0 * alpha / MY_PIS * erfcd
                             + r * f_shift) * r
    ecoul = (prefactor * (erfcc - r * e_shift - r2 * f_shift)
             if eflag else None)
    if factor_coul is not None:
        sub = (1.0 - factor_coul) * prefactor
        forcecoul = forcecoul - sub
        if eflag:
            ecoul = ecoul - sub
    return forcecoul, ecoul


def coul_wolf_terms(r2, qiqj, qqrd2e, alpha, cut_coul, factor_coul, eflag):
    """(forcecoul = F*r, ecoul). TRUE erfc (the reference calls libc erfc
    here, unlike dsf/long; ref: pair_coul_wolf.cpp:113-136)."""
    import math

    from jax.scipy.special import erfc as erfc_t

    cut = cut_coul
    e_shift = math.erfc(alpha * cut) / cut
    f_shift = -(e_shift + 2.0 * alpha / MY_PIS
                * math.exp(-alpha * alpha * cut * cut)) / cut

    r = jnp.sqrt(r2)
    prefactor = qqrd2e * qiqj / r
    erfcc = erfc_t(alpha * r)
    erfcd = jnp.exp(-alpha * alpha * r2)
    v_sh = (erfcc - e_shift * r) * prefactor
    dvdrr = (erfcc / r2 + 2.0 * alpha / MY_PIS * erfcd / r) + f_shift
    forcecoul = dvdrr * r2 * prefactor
    ecoul = v_sh if eflag else None
    if factor_coul is not None:
        sub = (1.0 - factor_coul) * prefactor
        forcecoul = forcecoul - sub
        if eflag:
            ecoul = ecoul - sub
    return forcecoul, ecoul


def coul_debye_terms(r2, qiqj, qqrd2e, kappa, factor_coul, eflag):
    """(forcecoul = F*r, ecoul). Screened coulomb; the special factor
    MULTIPLIES (no long-range subtraction semantics;
    ref: pair_coul_debye.cpp:87-102)."""
    r = jnp.sqrt(r2)
    rinv = 1.0 / r
    screening = jnp.exp(-kappa * r)
    forcecoul = qqrd2e * qiqj * screening * (kappa + rinv)
    ecoul = qqrd2e * qiqj * rinv * screening if eflag else None
    if factor_coul is not None:
        forcecoul = forcecoul * factor_coul
        if eflag:
            ecoul = ecoul * factor_coul
    return forcecoul, ecoul


# MSM gamma-splitting polynomial coefficients, indexed by split_order =
# order/2 (ref: src/kspace.cpp:100-148; Eq 4 of Hardy et al., Parallel
# Computing 35 (2009) 164-177)
GCONS = {
    2: (15 / 8, -5 / 4, 3 / 8),
    3: (35 / 16, -35 / 16, 21 / 16, -5 / 16),
    4: (315 / 128, -105 / 32, 189 / 64, -45 / 32, 35 / 128),
    5: (693 / 256, -1155 / 256, 693 / 128, -495 / 128, 385 / 256,
        -63 / 256),
    6: (3003 / 1024, -3003 / 512, 9009 / 1024, -2145 / 256, 5005 / 1024,
        -819 / 512, 231 / 1024),
}
DGCONS = {
    2: (-5 / 2, 3 / 2),
    3: (-35 / 8, 21 / 4, -15 / 8),
    4: (-105 / 16, 189 / 16, -135 / 16, 35 / 16),
    5: (-1155 / 128, 693 / 32, -1485 / 64, 385 / 32, -315 / 128),
    6: (-3003 / 256, 9009 / 256, -6435 / 128, 5005 / 128, -4095 / 256,
        693 / 256),
}


def msm_gamma(rho, split_order: int):
    """gamma(rho) for rho <= 1 (ref: kspace.h:147-160)."""
    c = GCONS[split_order]
    rho2 = rho * rho
    g = jnp.full_like(rho, c[0])
    rho_n = rho2
    for n in range(1, split_order + 1):
        g = g + c[n] * rho_n
        rho_n = rho_n * rho2
    return jnp.where(rho <= 1.0, g, 1.0 / jnp.where(rho > 1.0, rho, 1.0))


def msm_dgamma(rho, split_order: int):
    c = DGCONS[split_order]
    rho2 = rho * rho
    dg = c[0] * rho
    rho_n = rho * rho2
    for n in range(1, split_order):
        dg = dg + c[n] * rho_n
        rho_n = rho_n * rho2
    return jnp.where(rho <= 1.0, dg,
                     -1.0 / jnp.where(rho > 1.0, rho * rho, 1.0))


def coul_msm_terms(r2, qiqj, qqrd2e, split_order, cut_coul, factor_coul,
                   eflag):
    """(forcecoul = F*r, ecoul): the MSM real-space split
    qq/r * (1 - rho*gamma(rho)) (ref: src/KSPACE/pair_coul_msm.cpp
    egamma/fgamma lines)."""
    r = jnp.sqrt(r2)
    rho = r / cut_coul
    prefactor = qqrd2e * qiqj / r
    egamma = 1.0 - rho * msm_gamma(rho, split_order)
    fgamma = 1.0 + (r2 / (cut_coul * cut_coul)) * msm_dgamma(rho,
                                                             split_order)
    forcecoul = prefactor * fgamma
    ecoul = prefactor * egamma if eflag else None
    if factor_coul is not None:
        sub = (1.0 - factor_coul) * prefactor
        forcecoul = forcecoul - sub
        if eflag:
            ecoul = ecoul - sub
    return forcecoul, ecoul


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vdw", "cut_coulsq_tab"],
    meta_fields=["ntypes", "coul_mode", "alpha", "cut_coul", "g_ewald",
                 "self_energy", "dsf_poly", "cs"],
)
@dataclasses.dataclass(frozen=True)
class PairVdwCoul:
    """Generic vdW + point-charge coulomb on one neighbor matrix.

    vdw: a pair_simple-style object with pair_terms()/cutsq (or None for
    pure-coulomb styles). coul_mode: cut|long|dsf|wolf|debye. `alpha`
    doubles as kappa for debye. self_energy: per-unit-q^2 constant for
    dsf/wolf (times qqrd2e, summed over owned atoms)."""

    vdw: object | None
    ntypes: int
    coul_mode: str
    alpha: float
    cut_coul: float
    g_ewald: float = 0.0
    self_energy: float = 0.0
    # optional [ntypes+1, ntypes+1] per-pair coulomb cutoff-squared table
    # (e.g. nm/cut/coul/cut's optional per-coeff cutoffs,
    # ref: pair_nm_cut_coul_cut.cpp coeff() narg>=7)
    cut_coulsq_tab: Array | None = None
    # dsf erfc flavour: lj/cut/coul/dsf + plain coul/dsf use the A&S
    # t-polynomial (pair_lj_cut_coul_dsf.cpp:143), born/coul/dsf the exact
    # erfcx (pair_born_coul_dsf.cpp:136). None = poly iff no vdw (the
    # born-style default).
    dsf_poly: bool | None = None
    # CORESHELL variant flag for coul_mode="long" (the */cs styles,
    # ref: src/CORESHELL/pair_*_cs.cpp — see coul_long_terms)
    cs: bool = False

    def max_cutoff(self) -> float:
        vc = self.vdw.max_cutoff() if self.vdw is not None else 0.0
        return max(vc, self.cut_coul)

    def cutsq_table(self) -> Array:
        c = self.max_cutoff()
        return jnp.full((self.ntypes + 1, self.ntypes + 1), c * c)

    def compute(self, state, nl, eflag, vflag,
                special_lj=None, special_coul=None):
        f, ev, ec, vir = self.compute_detailed(
            state, nl, eflag, vflag, special_lj, special_coul)
        return f, (ev + ec) if eflag else None, vir

    def compute_detailed(self, state, nl, eflag, vflag,
                         special_lj=None, special_coul=None):
        dt = state.dtype
        qqrd2e = _qqrd2e(state)
        j, jc, pair_valid, dx, r2 = gather_pairs(state, nl)

        flj = fcoul = None
        if nl.sb is not None:
            if special_lj is not None:
                flj = jnp.asarray(special_lj, dt)[nl.sb]
            if special_coul is not None:
                fcoul = jnp.asarray(special_coul, dt)[nl.sb]

        fpair = jnp.zeros_like(r2)
        evdwl = jnp.zeros((), dt) if eflag else None
        if self.vdw is not None:
            ti = None if self.ntypes == 1 else state.type[:, None]
            tj = None if self.ntypes == 1 else state.type[jc]
            von = pair_valid & (r2 < (self.vdw.cutsq[1, 1]
                                      if self.ntypes == 1
                                      else self.vdw.cutsq[ti, tj]))
            r2s = jnp.where(von, r2, 1.0)
            fp, e = self.vdw.pair_terms(r2s, ti, tj, eflag)
            if flj is not None:
                fp = fp * flj
                if eflag:
                    e = e * flj
            fpair = fpair + jnp.where(von, fp, 0.0)
            if eflag:
                owned = state.owned_mask[:, None]
                evdwl = 0.5 * jnp.sum(jnp.where(von & owned, e, 0.0))

        ecoul = jnp.zeros((), dt) if eflag else None
        if state.q is not None and self.coul_mode != "none":
            qiqj = state.q[:, None] * state.q[jc]
            if self.cut_coulsq_tab is not None:
                ti = state.type[:, None]
                tj = state.type[jc]
                ccsq = self.cut_coulsq_tab[ti, tj]
            else:
                ccsq = self.cut_coul ** 2
            con = pair_valid & (r2 < ccsq)
            r2s = jnp.where(con, r2, 1.0)
            if self.coul_mode == "dsf":
                poly = (self.vdw is None if self.dsf_poly is None
                        else self.dsf_poly)
                fc, e = coul_dsf_terms(r2s, qiqj, qqrd2e, self.alpha,
                                       self.cut_coul, fcoul, eflag,
                                       poly=poly)
            elif self.coul_mode == "wolf":
                fc, e = coul_wolf_terms(r2s, qiqj, qqrd2e, self.alpha,
                                        self.cut_coul, fcoul, eflag)
            elif self.coul_mode == "debye":
                fc, e = coul_debye_terms(r2s, qiqj, qqrd2e, self.alpha,
                                         fcoul, eflag)
            elif self.coul_mode == "msm":
                fc, e = coul_msm_terms(r2s, qiqj, qqrd2e,
                                       int(self.alpha), self.cut_coul,
                                       fcoul, eflag)
            elif self.coul_mode == "long":
                fc, e = coul_long_terms(r2s, qiqj, qqrd2e, self.g_ewald,
                                        fcoul, eflag, cs=self.cs)
            else:
                fc, e = coul_cut_terms(r2s, qiqj, qqrd2e, fcoul, eflag)
            fpair = fpair + jnp.where(con, fc, 0.0) / r2s
            if eflag:
                owned = state.owned_mask[:, None]
                ecoul = 0.5 * jnp.sum(jnp.where(con & owned, e, 0.0))
                if self.self_energy:
                    qs = jnp.where(state.owned_mask & state.valid_mask,
                                   state.q, 0.0)
                    ecoul = ecoul + self.self_energy * qqrd2e * jnp.sum(
                        qs * qs)

        fpair = jnp.where(pair_valid, fpair, 0.0)
        f = jnp.sum(dx * fpair[..., None], axis=1)
        virial = None
        if vflag:
            owned = state.owned_mask[:, None]
            virial = tally_virial(jnp.where(owned, fpair, 0.0), dx)
        return f, evdwl, ecoul, virial


def self_energy_const(mode: str, alpha: float, cut_coul: float) -> float:
    """-(e_shift/2 + alpha/sqrt(pi)) per q^2 (ref: pair_coul_dsf.cpp:98 /
    pair_coul_wolf.cpp:99); e_shift differs: dsf uses the A&S erfc, wolf
    the true erfc."""
    import math

    if mode == "dsf":
        erfcd_c = math.exp(-alpha * alpha * cut_coul * cut_coul)
        erfcc_c = math.erfc(alpha * cut_coul)
        f_shift = -(erfcc_c / (cut_coul * cut_coul)
                    + 2.0 / MY_PIS * alpha * erfcd_c / cut_coul)
        e_shift = erfcc_c / cut_coul - f_shift * cut_coul
    elif mode == "wolf":
        e_shift = math.erfc(alpha * cut_coul) / cut_coul
    else:
        return 0.0
    return -(e_shift / 2.0 + alpha / MY_PIS)
