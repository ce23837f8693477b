"""EXTRA-PAIR / CLASS2 two-body pair styles.

TPU-native re-implementations expressed through the shared neighbor-matrix
engine (`pair_terms(r2, ti, tj, eflag) -> (F/r, e)` consumed by
models/pair.py compute and models/pair_coul_misc.PairVdwCoul):

  lj/class2            (ref: src/CLASS2/pair_lj_class2.cpp, 9-6 LJ,
                        sixthpower mixing :509-516)
  lj96/cut             (ref: src/EXTRA-PAIR/pair_lj96_cut.cpp)
  mie/cut              (ref: src/EXTRA-PAIR/pair_mie_cut.cpp:528-545)
  nm/cut               (ref: src/EXTRA-PAIR/pair_nm_cut.cpp:242-251)
  lj/gromacs           (ref: src/EXTRA-PAIR/pair_lj_gromacs.cpp:265-288
                        switch polynomials)
  lj/smooth/linear     (ref: src/EXTRA-PAIR/pair_lj_smooth_linear.cpp:241)
  lj/cubic             (ref: src/EXTRA-PAIR/pair_lj_cubic.cpp +
                        pair_lj_cubic_const.h)
  soft                 (ref: src/pair_soft.cpp)
  gauss/cut            (ref: src/EXTRA-PAIR/pair_gauss_cut.cpp)
  ufm                  (ref: src/EXTRA-PAIR/pair_ufm.cpp:228-234)
  wf/cut               (ref: src/EXTRA-PAIR/pair_wf_cut.cpp:230-246,
                        Wang-Frenkel 2020)
  cosine/squared       (ref: src/EXTRA-PAIR/pair_cosine_squared.cpp)
  zero                 (ref: src/pair_zero.cpp)

All coefficient tables are [ntypes+1, ntypes+1]; unset cross terms mix per
each style's reference rule (eps geometric, distances per `mix`).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pair_simple import _SimplePair

Array = jax.Array


def _mix_tables(ntypes, coeffs, ncoeff, cut_global, mixer,
                mix="geometric"):
    """Tables with style-specific cross-term mixing. coeffs[(i,j)] =
    (c0..c{n-1}[, cut]); mixer(ci, cj) -> mixed coeff tuple (without cut);
    the cutoff mixes by mix_distance(mix)."""
    tabs = [np.zeros((ntypes + 1, ntypes + 1)) for _ in range(ncoeff)]
    cut = np.full((ntypes + 1, ntypes + 1), float(cut_global))
    setflag = np.zeros((ntypes + 1, ntypes + 1), dtype=bool)
    for (i, j), c in coeffs.items():
        lo, hi = min(i, j), max(i, j)
        for t in range(ncoeff):
            tabs[t][lo, hi] = c[t]
        if len(c) > ncoeff:
            cut[lo, hi] = c[ncoeff]
        setflag[lo, hi] = True
    for i in range(1, ntypes + 1):
        for j in range(i + 1, ntypes + 1):
            if not setflag[i, j]:
                vals = mixer([tabs[t][i, i] for t in range(ncoeff)],
                             [tabs[t][j, j] for t in range(ncoeff)])
                for t in range(ncoeff):
                    tabs[t][i, j] = vals[t]
                cut[i, j] = (math.sqrt(cut[i, i] * cut[j, j])
                             if mix == "geometric"
                             else 0.5 * (cut[i, i] + cut[j, j]))
    for a in tabs + [cut]:
        for i in range(1, ntypes + 1):
            for j in range(1, i):
                a[i, j] = a[j, i]
    return tabs, cut


def _std_mixer(mix="geometric"):
    """LAMMPS mix_energy/mix_distance (ref: src/pair.cpp:702-727):
    epsilon = sqrt(e1 e2) for geometric AND arithmetic; distance columns
    sqrt(d1 d2) (geometric) or (d1+d2)/2 (arithmetic)."""

    def dist(a, b):
        return math.sqrt(a * b) if mix == "geometric" else 0.5 * (a + b)

    def mixer(ci, cj):
        return [math.sqrt(ci[0] * cj[0])] + [
            dist(a, b) for a, b in zip(ci[1:], cj[1:])]

    return mixer


def _finish(cls, ntypes, tabs, cut, dtype, shift_fn=None, shift=False,
            **extra):
    cutsq = cut * cut
    off = np.zeros_like(cut)
    if shift and shift_fn is not None:
        for i in range(1, ntypes + 1):
            for j in range(1, ntypes + 1):
                if cut[i, j] > 0:
                    off[i, j] = shift_fn(
                        [t[i, j] for t in tabs], cut[i, j])
    arrs = [jnp.asarray(a, dtype=dtype) for a in tabs]
    return cls(*arrs, cutsq=jnp.asarray(cutsq, dtype=dtype),
               offset=jnp.asarray(off, dtype=dtype), ntypes=ntypes,
               cut_max=float(cut.max()), **extra)


def _pairstyle(fields, meta=("ntypes", "cut_max")):
    def deco(cls):
        return partial(
            jax.tree_util.register_dataclass,
            data_fields=list(fields) + ["cutsq", "offset"],
            meta_fields=list(meta))(dataclasses.dataclass(frozen=True)(cls))
    return deco


@_pairstyle(["eps", "sig"])
class PairLJClass2(_SimplePair):
    """E = eps [2 (s/r)^9 - 3 (s/r)^6] (ref: pair_lj_class2.cpp:520-523)."""

    eps: Array
    sig: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        eps = self._p(self.eps, ti, tj)
        sig = self._p(self.sig, ti, tj)
        off = self._p(self.offset, ti, tj)
        r2inv = 1.0 / r2
        rinv = jnp.sqrt(r2inv)
        s3 = (sig * sig * sig)
        r3inv = r2inv * rinv * s3
        r6inv = r3inv * r3inv
        forcelj = r6inv * (18.0 * eps * r3inv - 18.0 * eps)
        e = r6inv * (2.0 * eps * r3inv - 3.0 * eps) - off if eflag else None
        return forcelj * r2inv, e


@_pairstyle(["eps", "sig"])
class PairLJ96(_SimplePair):
    """E = 4 eps [(s/r)^9 - (s/r)^6] (ref: pair_lj96_cut.cpp:518-521)."""

    eps: Array
    sig: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        eps = self._p(self.eps, ti, tj)
        sig = self._p(self.sig, ti, tj)
        off = self._p(self.offset, ti, tj)
        r2inv = 1.0 / r2
        rinv = jnp.sqrt(r2inv)
        s3 = sig * sig * sig
        r3inv = r2inv * rinv * s3
        r6inv = r3inv * r3inv
        forcelj = r6inv * (36.0 * eps * r3inv - 24.0 * eps)
        e = r6inv * (4.0 * eps * r3inv - 4.0 * eps) - off if eflag else None
        return forcelj * r2inv, e


@_pairstyle(["eps", "sig", "gamr", "gama"])
class PairMie(_SimplePair):
    """Mie n-m: E = C eps [(s/r)^gR - (s/r)^gA],
    C = gR/(gR-gA) (gR/gA)^{gA/(gR-gA)} (ref: pair_mie_cut.cpp:533-545)."""

    eps: Array
    sig: Array
    gamr: Array
    gama: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        eps = self._p(self.eps, ti, tj)
        sig = self._p(self.sig, ti, tj)
        gr = self._p(self.gamr, ti, tj)
        ga = self._p(self.gama, ti, tj)
        off = self._p(self.offset, ti, tj)
        cmie = gr / (gr - ga) * (gr / ga) ** (ga / (gr - ga))
        rinv = jax.lax.rsqrt(r2)
        sr = sig * rinv
        rgr = sr**gr
        rga = sr**ga
        forcemie = cmie * eps * (gr * rgr - ga * rga)
        e = cmie * eps * (rgr - rga) - off if eflag else None
        return forcemie / r2, e


@_pairstyle(["e0", "r0", "nn", "mm"])
class PairNMCut(_SimplePair):
    """E = E0/(n-m) [m (r0/r)^n - n (r0/r)^m]
    (ref: pair_nm_cut.cpp:242-251)."""

    e0: Array
    r0: Array
    nn: Array
    mm: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        e0 = self._p(self.e0, ti, tj)
        r0 = self._p(self.r0, ti, tj)
        nn = self._p(self.nn, ti, tj)
        mm = self._p(self.mm, ti, tj)
        off = self._p(self.offset, ti, tj)
        e0nm = e0 / (nn - mm)
        r = jnp.sqrt(r2)
        rn = (r0 / r) ** nn
        rm = (r0 / r) ** mm
        forcenm = e0nm * nn * mm * (rn - rm)
        e = e0nm * (mm * rn - nn * rm) - off if eflag else None
        return forcenm / r2, e


@_pairstyle(["eps", "sig", "cut_inner"])
class PairLJGromacs(_SimplePair):
    """12-6 LJ force-switched to zero between cut_inner and cut
    (ref: pair_lj_gromacs.cpp:265-288 a/b/c polynomial construction)."""

    eps: Array
    sig: Array
    cut_inner: Array
    cutsq: Array
    offset: Array  # unused (GROMACS switch replaces offsets)
    ntypes: int
    cut_max: float

    def _sw(self, ti, tj):
        eps = self._p(self.eps, ti, tj)
        sig = self._p(self.sig, ti, tj)
        ci = self._p(self.cut_inner, ti, tj)
        rc = jnp.sqrt(self._p(self.cutsq, ti, tj))
        lj1 = 48.0 * eps * sig**12
        lj2 = 24.0 * eps * sig**6
        lj3 = 4.0 * eps * sig**12
        lj4 = 4.0 * eps * sig**6
        r6inv = rc**-6
        r8inv = rc**-8
        t = rc - ci
        a6 = (7.0 * ci - 10.0 * rc) * r8inv / t**2
        b6 = (9.0 * rc - 7.0 * ci) * r8inv / t**3
        a12 = (13.0 * ci - 16.0 * rc) * r6inv * r8inv / t**2
        b12 = (15.0 * rc - 13.0 * ci) * r6inv * r8inv / t**3
        c6 = r6inv - t**3 * (6.0 * a6 / 3.0 + 6.0 * b6 * t / 4.0)
        c12 = r6inv * r6inv - t**3 * (12.0 * a12 / 3.0
                                      + 12.0 * b12 * t / 4.0)
        sw1 = lj1 * a12 - lj2 * a6
        sw2 = lj1 * b12 - lj2 * b6
        sw3 = -lj3 * 12.0 * a12 / 3.0 + lj4 * 6.0 * a6 / 3.0
        sw4 = -lj3 * 12.0 * b12 / 4.0 + lj4 * 6.0 * b6 / 4.0
        sw5 = -lj3 * c12 + lj4 * c6
        return (lj1, lj2, lj3, lj4, ci, sw1, sw2, sw3, sw4, sw5)

    def pair_terms(self, r2, ti, tj, eflag):
        lj1, lj2, lj3, lj4, ci, sw1, sw2, sw3, sw4, sw5 = self._sw(ti, tj)
        r2inv = 1.0 / r2
        r6inv = r2inv * r2inv * r2inv
        forcelj = r6inv * (lj1 * r6inv - lj2)
        r = jnp.sqrt(r2)
        t = jnp.maximum(r - ci, 0.0)
        on = r2 > ci * ci
        forcelj = forcelj + jnp.where(on, r * t * t * (sw1 + sw2 * t), 0.0)
        e = None
        if eflag:
            e = r6inv * (lj3 * r6inv - lj4) + sw5
            e = e + jnp.where(on, t**3 * (sw3 + sw4 * t), 0.0)
        return forcelj * r2inv, e


@_pairstyle(["eps", "sig"])
class PairLJSmoothLinear(_SimplePair):
    """E = lj(r) - lj(rc) + (r-rc) F(rc)
    (ref: pair_lj_smooth_linear.cpp:241-242). The reference tallies the
    UNWEIGHTED energy for special pairs (factor_lj scales only fpair in
    its compute()) — special_scales_force_only replicates that."""

    special_scales_force_only = True

    eps: Array
    sig: Array
    cutsq: Array
    offset: Array  # unused
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        eps = self._p(self.eps, ti, tj)
        sig = self._p(self.sig, ti, tj)
        rc = jnp.sqrt(self._p(self.cutsq, ti, tj))
        lj1 = 48.0 * eps * sig**12
        lj2 = 24.0 * eps * sig**6
        lj3 = 4.0 * eps * sig**12
        lj4 = 4.0 * eps * sig**6
        c6inv = rc**-6
        ljcut = c6inv * (lj3 * c6inv - lj4)
        dljcut = (1.0 / rc) * c6inv * (lj1 * c6inv - lj2)
        r2inv = 1.0 / r2
        r6inv = r2inv * r2inv * r2inv
        rinv = jnp.sqrt(r2inv)
        forcelj = rinv * r6inv * (lj1 * r6inv - lj2) - dljcut
        e = None
        if eflag:
            r = jnp.sqrt(r2)
            e = r6inv * (lj3 * r6inv - lj4) - ljcut + (r - rc) * dljcut
        return forcelj * rinv, e


@_pairstyle(["a"])
class PairSoft(_SimplePair):
    """E = A (1 + cos(pi r / rc)) (ref: src/pair_soft.cpp:93-110)."""

    a: Array
    cutsq: Array
    offset: Array  # unused
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        a = self._p(self.a, ti, tj)
        rc = jnp.sqrt(self._p(self.cutsq, ti, tj))
        r = jnp.sqrt(r2)
        arg = jnp.pi * r / rc
        fpair = a * (jnp.pi / rc) * jnp.sin(arg) / jnp.maximum(r, 1e-300)
        e = a * (1.0 + jnp.cos(arg)) if eflag else None
        return fpair, e


@_pairstyle(["h", "rmh", "sigmah"])
class PairGaussCut(_SimplePair):
    """E = H/(sig sqrt(2 pi)) e^{-(r-rmh)^2 / (2 sig^2)}
    (ref: pair_gauss_cut.cpp:224-243)."""

    h: Array
    rmh: Array
    sigmah: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        h = self._p(self.h, ti, tj)
        rmh = self._p(self.rmh, ti, tj)
        sh = self._p(self.sigmah, ti, tj)
        off = self._p(self.offset, ti, tj)
        pg = h / (sh * jnp.sqrt(2.0 * jnp.pi))
        r = jnp.sqrt(r2)
        rexp = (r - rmh) / sh
        ug = pg * jnp.exp(-0.5 * rexp * rexp)
        fpair = rexp / r * ug / sh
        e = ug - off if eflag else None
        return fpair, e


# lj/cubic spline constants (ref: pair_lj_cubic_const.h; rmin = sig 2^1/6)
_RT6TWO = 1.1224620483093730
_SS = 1.1086834179687215
_PHIS = -0.7869822485207097
_DPHIDS = 2.6899008972047196
_A3 = 27.9335700460986445
_SM = 1.5475372709146737


@_pairstyle(["eps", "sig"])
class PairLJCubic(_SimplePair):
    """12-6 LJ to the inflection point rs = rmin*SS, cubic spline to zero
    at rmin*SM (ref: pair_lj_cubic.cpp:105-135; constants above).
    No explicit cutoff argument: cut = rmin*SM per pair."""

    eps: Array
    sig: Array
    cutsq: Array
    offset: Array  # unused
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        eps = self._p(self.eps, ti, tj)
        sig = self._p(self.sig, ti, tj)
        lj1 = 48.0 * eps * sig**12
        lj2 = 24.0 * eps * sig**6
        lj3 = 4.0 * eps * sig**12
        lj4 = 4.0 * eps * sig**6
        rmin = sig * _RT6TWO
        rin = rmin * _SS
        r2inv = 1.0 / r2
        r6inv = r2inv * r2inv * r2inv
        r = jnp.sqrt(r2)
        t = (r - rin) / rmin
        inner = r2 <= rin * rin
        forcelj = jnp.where(
            inner,
            r6inv * (lj1 * r6inv - lj2),
            eps * (-_DPHIDS + _A3 * t * t / 2.0) * r / rmin)
        e = None
        if eflag:
            e = jnp.where(
                inner,
                r6inv * (lj3 * r6inv - lj4),
                eps * (_PHIS + _DPHIDS * t - _A3 * t**3 / 6.0))
        return forcelj * r2inv, e


@_pairstyle(["eps", "sig"])
class PairUFM(_SimplePair):
    """Uhlenbeck-Ford: E = -eps ln(1 - e^{-r^2/sig^2})
    (ref: pair_ufm.cpp:228-234)."""

    eps: Array
    sig: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        eps = self._p(self.eps, ti, tj)
        sig = self._p(self.sig, ti, tj)
        off = self._p(self.offset, ti, tj)
        uf1 = 2.0 * eps / (sig * sig)
        uf2 = 1.0 / (sig * sig)
        expuf = jnp.exp(-r2 * uf2)
        fpair = uf1 * expuf / (1.0 - expuf)
        e = -eps * jnp.log(1.0 - expuf) - off if eflag else None
        return fpair, e


@_pairstyle(["eps", "sig", "nu", "mu"])
class PairWFCut(_SimplePair):
    """Wang-Frenkel: E = e0 (sig^2mu/r^2mu - 1)(rc^2mu/r^2mu - 1)^2nu
    (ref: pair_wf_cut.cpp:105-135, 230-246)."""

    eps: Array
    sig: Array
    nu: Array
    mu: Array
    cutsq: Array
    offset: Array  # unused
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        eps = self._p(self.eps, ti, tj)
        sig = self._p(self.sig, ti, tj)
        nu = self._p(self.nu, ti, tj)
        mu = self._p(self.mu, ti, tj)
        rc2 = self._p(self.cutsq, ti, tj)
        rc_sig2mu = (rc2 / (sig * sig)) ** mu
        e0 = eps * 2.0 * nu * rc_sig2mu * (
            (1.0 + 2.0 * nu) / (2.0 * nu) / (rc_sig2mu - 1.0)
        ) ** (2.0 * nu + 1.0)
        sig2mu = (sig * sig) ** mu
        rc2mu = rc2**mu
        r2inv = 1.0 / r2
        rminv = r2inv**mu
        rm = sig2mu * rminv - 1.0
        rn = rc2mu * rminv - 1.0
        forcenm = (2.0 * mu * sig2mu * rn ** (2.0 * nu)
                   + 4.0 * nu * mu * rc2mu * rm * rn ** (2.0 * nu - 1.0))
        fpair = e0 * forcenm * r2inv ** (mu + 1.0)  # already F/r form
        e = e0 * rm * rn ** (2.0 * nu) if eflag else None
        return fpair, e


@_pairstyle(["eps", "sig", "wca"])
class PairCosineSquared(_SimplePair):
    """E = -eps cos^2(pi (r-sig)/(2 w)) for sig<r<rc, -eps inside sig,
    optional WCA core (ref: pair_cosine_squared.cpp:190-207 compute)."""

    eps: Array
    sig: Array
    wca: Array
    cutsq: Array
    offset: Array  # unused
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        eps = self._p(self.eps, ti, tj)
        sig = self._p(self.sig, ti, tj)
        wca = self._p(self.wca, ti, tj)
        rc = jnp.sqrt(self._p(self.cutsq, ti, tj))
        w = jnp.maximum(rc - sig, 1e-300)
        r = jnp.sqrt(r2)
        # WCA branch (r <= sigma and wcaflag)
        r2inv = 1.0 / r2
        r6inv = r2inv * r2inv * r2inv
        lj12e = eps * sig**12
        lj6e = 2.0 * eps * sig**6
        lj12f = 12.0 * eps * sig**12
        lj6f = 12.0 * eps * sig**6
        f_wca = r6inv * (lj12f * r6inv - lj6f) * r2inv
        e_wca = r6inv * (lj12e * r6inv - lj6e) \
            + jnp.where(rc == sig, eps, 0.0)
        # cosine tail branch (r > sigma)
        arg = jnp.pi * (r - sig) / w
        f_cos = -(jnp.pi * eps / (2.0 * w)) * jnp.sin(arg) / r
        cosone = jnp.cos(0.5 * arg)
        e_cos = -eps * cosone * cosone
        inside = r <= sig
        fpair = jnp.where(inside, jnp.where(wca != 0.0, f_wca, 0.0), f_cos)
        e = None
        if eflag:
            e = jnp.where(inside,
                          jnp.where(wca != 0.0, e_wca, -eps), e_cos)
        return fpair, e


@_pairstyle([])
class PairZero(_SimplePair):
    """pair zero: neighbor-only style, no force/energy
    (ref: src/pair_zero.cpp)."""

    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        z = jnp.zeros_like(r2)
        return z, (z if eflag else None)


# -- makers ------------------------------------------------------------------


def _mk(cls, ntypes, coeffs, ncoeff, cut_global, mixer, dtype,
        shift=False, shift_fn=None, mix="geometric"):
    tabs, cut = _mix_tables(ntypes, coeffs, ncoeff, cut_global, mixer,
                            mix=mix)
    return _finish(cls, ntypes, tabs, cut, dtype, shift_fn=shift_fn,
                   shift=shift)


def _sixthpower_mixer(ci, cj):
    e1, s1 = ci[0], ci[1]
    e2, s2 = cj[0], cj[1]
    eps = (2.0 * math.sqrt(e1 * e2) * s1**3 * s2**3) / (s1**6 + s2**6)
    sig = (0.5 * (s1**6 + s2**6)) ** (1.0 / 6.0)
    return [eps, sig]


def make_lj_class2(ntypes, coeffs, cut_global, shift=False,
                   dtype=jnp.float64, mix="arithmetic"):
    # epsilon/sigma always sixthpower (pair_lj_class2.cpp:509); only the
    # cutoff follows pair_modify mix
    def sfn(tab, rc):
        eps, sig = tab
        ratio = sig / rc
        return eps * (2.0 * ratio**9 - 3.0 * ratio**6)

    return _mk(PairLJClass2, ntypes, coeffs, 2, cut_global,
               _sixthpower_mixer, dtype, shift=shift, shift_fn=sfn,
               mix=mix)


def make_lj96(ntypes, coeffs, cut_global, shift=False, dtype=jnp.float64,
              mix="geometric"):
    def sfn(tab, rc):
        eps, sig = tab
        ratio = sig / rc
        return 4.0 * eps * (ratio**9 - ratio**6)

    return _mk(PairLJ96, ntypes, coeffs, 2, cut_global,
               _std_mixer(mix), dtype, shift=shift, shift_fn=sfn, mix=mix)


def make_mie(ntypes, coeffs, cut_global, shift=False, dtype=jnp.float64,
             mix="geometric"):
    mixer = _std_mixer(mix)

    def sfn(tab, rc):
        eps, sig, gr, ga = tab
        cmie = gr / (gr - ga) * (gr / ga) ** (ga / (gr - ga))
        ratio = sig / rc
        return cmie * eps * (ratio**gr - ratio**ga)

    return _mk(PairMie, ntypes, coeffs, 4, cut_global, mixer, dtype,
               shift=shift, shift_fn=sfn, mix=mix)


def make_nm_cut(ntypes, coeffs, cut_global, shift=False, dtype=jnp.float64,
                mix="geometric"):
    def sfn(tab, rc):
        e0, r0, nn, mm = tab
        return e0 / (nn - mm) * (mm * (r0 / rc) ** nn - nn * (r0 / rc) ** mm)

    def mixer(ci, cj):
        raise ValueError("pair nm/cut does not mix; set all pairs")

    return _mk(PairNMCut, ntypes, coeffs, 4, cut_global, mixer, dtype,
               shift=shift, shift_fn=sfn)


def make_lj_gromacs(ntypes, coeffs, cut_inner, cut_global,
                    dtype=jnp.float64, mix="geometric"):
    full = {k: (c[0], c[1],
                c[2] if len(c) > 2 else cut_inner,
                c[3] if len(c) > 3 else cut_global)
            for k, c in coeffs.items()}
    tabs, cut = _mix_tables(ntypes, full, 3, cut_global,
                            _std_mixer(mix), mix=mix)
    return _finish(PairLJGromacs, ntypes, tabs, cut, dtype)


def make_lj_smooth_linear(ntypes, coeffs, cut_global, dtype=jnp.float64,
                          mix="geometric"):
    return _mk(PairLJSmoothLinear, ntypes, coeffs, 2, cut_global,
               _std_mixer(mix), dtype, mix=mix)


def make_soft(ntypes, coeffs, cut_global, dtype=jnp.float64,
              mix="geometric"):
    def mixer(ci, cj):
        return [math.sqrt(ci[0] * cj[0])]

    return _mk(PairSoft, ntypes, coeffs, 1, cut_global, mixer, dtype,
               mix=mix)


def make_gauss_cut(ntypes, coeffs, cut_global, shift=False,
                   dtype=jnp.float64, mix="geometric"):
    def dist(a, b):
        return (math.sqrt(a * b) if mix == "geometric" else 0.5 * (a + b))

    def mixer(ci, cj):
        return [math.sqrt(abs(ci[0]) * abs(cj[0])),
                dist(ci[1], cj[1]), dist(ci[2], cj[2])]

    def sfn(tab, rc):
        h, rmh, sh = tab
        pg = h / (sh * math.sqrt(2.0 * math.pi))
        rexp = (rc - rmh) / sh
        return pg * math.exp(-0.5 * rexp * rexp)

    return _mk(PairGaussCut, ntypes, coeffs, 3, cut_global, mixer, dtype,
               shift=shift, shift_fn=sfn, mix=mix)


def make_lj_cubic(ntypes, coeffs, dtype=jnp.float64, mix="geometric"):
    # cut = rmin*SM per pair, no global cutoff argument; cut mixes like
    # sigma (it IS sigma * const)
    full = {}
    for k, c in coeffs.items():
        rmin = c[1] * _RT6TWO
        full[k] = (c[0], c[1], rmin * _SM)
    tabs, cut = _mix_tables(ntypes, full, 2, 0.0, _std_mixer(mix),
                            mix=mix)
    return _finish(PairLJCubic, ntypes, tabs, cut, dtype)


def make_ufm(ntypes, coeffs, cut_global, shift=False, dtype=jnp.float64,
             mix="geometric"):
    def sfn(tab, rc):
        eps, sig = tab
        ratio = (rc / sig) ** 2
        return -eps * math.log(1.0 - math.exp(-ratio))

    return _mk(PairUFM, ntypes, coeffs, 2, cut_global,
               _std_mixer(mix), dtype, shift=shift, shift_fn=sfn, mix=mix)


def make_wf_cut(ntypes, coeffs, cut_global, dtype=jnp.float64):
    def mixer(ci, cj):
        raise ValueError("pair wf/cut does not mix; set all pairs")

    return _mk(PairWFCut, ntypes, coeffs, 4, cut_global, mixer, dtype)


def make_cosine_squared(ntypes, coeffs, cut_global, dtype=jnp.float64):
    # coeffs[(i,j)] = (eps, sigma[, cut]['wca' handled by caller: wca flag
    # appended as 0/1 third coeff])
    def mixer(ci, cj):
        raise ValueError("pair cosine/squared does not mix; set all pairs")

    return _mk(PairCosineSquared, ntypes, coeffs, 3, cut_global, mixer,
               dtype)


def make_pair_zero(ntypes, cut_global, dtype=jnp.float64):
    z = np.zeros((ntypes + 1, ntypes + 1))
    return PairZero(cutsq=jnp.asarray(
        np.full_like(z, cut_global**2), dtype=dtype),
        offset=jnp.asarray(z, dtype=dtype), ntypes=ntypes,
        cut_max=float(cut_global))


@_pairstyle(["aa_", "bb_", "a_", "alpha", "beta"])
class PairBeck(_SimplePair):
    """Beck He-He: E = AA e^{-r(alpha + beta r^5)} - BB/(a^2+r^2)^3
    (1 + (2.709 + 3 a^2)/(a^2+r^2)) (ref: src/EXTRA-PAIR/pair_beck.cpp
    compute():100-135)."""

    aa_: Array
    bb_: Array
    a_: Array
    alpha: Array
    beta: Array
    cutsq: Array
    offset: Array  # unused
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        AA = self._p(self.aa_, ti, tj)
        BB = self._p(self.bb_, ti, tj)
        aa = self._p(self.a_, ti, tj)
        al = self._p(self.alpha, ti, tj)
        be = self._p(self.beta, ti, tj)
        r = jnp.sqrt(r2)
        r5 = r2 * r2 * r
        term1 = aa * aa + r2
        term2 = term1**-5
        term3 = 21.672 + 30.0 * aa * aa + 6.0 * r2
        term4 = al + r5 * be
        term5 = al + 6.0 * r5 * be
        force = AA * jnp.exp(-r * term4) * term5 - BB * r * term2 * term3
        e = None
        if eflag:
            term6 = term1**-3
            e = (AA * jnp.exp(-r * term4)
                 - BB * term6 * (1.0 + (2.709 + 3.0 * aa * aa) / term1))
        return force / r, e


@_pairstyle(["biga0", "alpha0", "biga1", "beta1", "r0"])
class PairBornGauss(_SimplePair):
    """E = A0 e^{-alpha r} - A1 e^{-beta (r-r0)^2}
    (ref: src/EXTRA-PAIR/pair_born_gauss.cpp:100-130)."""

    biga0: Array
    alpha0: Array
    biga1: Array
    beta1: Array
    r0: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        a0 = self._p(self.biga0, ti, tj)
        al = self._p(self.alpha0, ti, tj)
        a1 = self._p(self.biga1, ti, tj)
        be = self._p(self.beta1, ti, tj)
        r0 = self._p(self.r0, ti, tj)
        off = self._p(self.offset, ti, tj)
        r = jnp.sqrt(r2)
        dr = r - r0
        aexp = a0 * jnp.exp(-al * r)
        bexp = a1 * jnp.exp(-be * dr * dr)
        fpair = (al * aexp - 2.0 * be * dr * bexp) / r
        e = (aexp - bexp - off) if eflag else None
        return fpair, e


def make_beck(ntypes, coeffs, cut_global, dtype=jnp.float64):
    def mixer(ci, cj):
        return [math.sqrt(a * b) for a, b in zip(ci, cj)]  # mix_energy-ish

    return _mk(PairBeck, ntypes, coeffs, 5, cut_global, mixer, dtype)


def make_born_gauss(ntypes, coeffs, cut_global, shift=False,
                    dtype=jnp.float64):
    def mixer(ci, cj):
        raise ValueError("pair born/gauss does not mix; set all pairs")

    def sfn(tab, rc):
        a0, al, a1, be, r0 = tab
        dr = rc - r0
        return a0 * math.exp(-al * rc) - a1 * math.exp(-be * dr * dr)

    return _mk(PairBornGauss, ntypes, coeffs, 5, cut_global, mixer, dtype,
               shift=shift, shift_fn=sfn)


# -- pair_style table ---------------------------------------------------------


def _nr_spline(x, y, yp1, ypn):
    """Numerical-Recipes cubic spline second derivatives
    (ref: pair_table.cpp spline())."""
    n = len(x)
    y2 = np.zeros(n)
    u = np.zeros(n)
    if yp1 > 0.99e30:
        y2[0] = u[0] = 0.0
    else:
        y2[0] = -0.5
        u[0] = (3.0 / (x[1] - x[0])) * ((y[1] - y[0]) / (x[1] - x[0]) - yp1)
    for i in range(1, n - 1):
        sig = (x[i] - x[i - 1]) / (x[i + 1] - x[i - 1])
        p = sig * y2[i - 1] + 2.0
        y2[i] = (sig - 1.0) / p
        u[i] = ((y[i + 1] - y[i]) / (x[i + 1] - x[i])
                - (y[i] - y[i - 1]) / (x[i] - x[i - 1]))
        u[i] = (6.0 * u[i] / (x[i + 1] - x[i - 1]) - sig * u[i - 1]) / p
    if ypn > 0.99e30:
        qn = un = 0.0
    else:
        qn = 0.5
        un = (3.0 / (x[n - 1] - x[n - 2])) * (
            ypn - (y[n - 1] - y[n - 2]) / (x[n - 1] - x[n - 2]))
    y2[n - 1] = (un - qn * u[n - 2]) / (qn * y2[n - 2] + 1.0)
    for k in range(n - 2, -1, -1):
        y2[k] = y2[k] * y2[k + 1] + u[k]
    return y2


def _nr_splint(xa, ya, y2a, x):
    """Cubic-spline evaluation (ref: pair_table.cpp splint())."""
    khi = np.searchsorted(xa, x)
    khi = np.clip(khi, 1, len(xa) - 1)
    klo = khi - 1
    h = xa[khi] - xa[klo]
    a = (xa[khi] - x) / h
    b = (x - xa[klo]) / h
    return (a * ya[klo] + b * ya[khi]
            + ((a**3 - a) * y2a[klo] + (b**3 - b) * y2a[khi])
            * (h * h) / 6.0)


def read_pair_table(path: str, keyword: str):
    """One section of a LAMMPS pair table file: (r, e, f, params dict)
    (ref: pair_table.cpp read_table/param_extract)."""
    lines = open(path).read().splitlines()
    i = 0
    while i < len(lines):
        s = lines[i].split("#")[0].strip()
        if s == keyword or s.split() and s.split()[0] == keyword:
            break
        i += 1
    else:
        raise ValueError(f"table keyword {keyword} not found in {path}")
    i += 1
    params = {"rflag": None, "fpflag": False}
    toks = lines[i].split()
    k = 0
    while k < len(toks):
        if toks[k] == "N":
            params["n"] = int(toks[k + 1]); k += 2
        elif toks[k] in ("R", "RSQ"):
            params["rflag"] = toks[k]
            params["rlo"] = float(toks[k + 1])
            params["rhi"] = float(toks[k + 2]); k += 3
        elif toks[k] in ("FPRIME", "FP"):
            params["fpflag"] = True
            params["fplo"] = float(toks[k + 1])
            params["fphi"] = float(toks[k + 2]); k += 3
        elif toks[k] == "EQ":
            params["r0"] = float(toks[k + 1]); k += 2
        else:
            k += 1
    i += 1
    r, e, f = [], [], []
    while i < len(lines) and len(r) < params["n"]:
        s = lines[i].split("#")[0].strip()
        i += 1
        if not s:
            continue
        w = s.split()
        r.append(float(w[1]))
        e.append(float(w[2]))
        f.append(float(w[3]))
    return (np.asarray(r), np.asarray(e), np.asarray(f), params)


@_pairstyle(["innersq", "delta", "invdelta", "rsqt", "et", "ft", "det",
             "dft", "e2t", "f2t", "tabidx"],
            meta=("ntypes", "cut_max", "tabstyle", "tablength"))
class PairTableStyle(_SimplePair):
    """pair_style table linear|spline|lookup N: file-tabulated pair
    interactions resampled onto an rsq-uniform internal grid with the
    reference's NR splines (ref: src/pair_table.cpp compute_table,
    compute: LOOKUP/LINEAR/SPLINE branches)."""

    innersq: Array  # [ntab]
    delta: Array
    invdelta: Array
    rsqt: Array     # [ntab, tablength]
    et: Array
    ft: Array
    det: Array      # [ntab, tablength-1] (linear)
    dft: Array
    e2t: Array      # [ntab, tablength] (spline)
    f2t: Array
    tabidx: Array   # [T+1, T+1] int32
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float
    tabstyle: str
    tablength: int

    def pair_terms(self, r2, ti, tj, eflag):
        tb = self.tabidx[1, 1] if self.ntypes == 1 else self.tabidx[ti, tj]
        innersq = self.innersq[tb]
        invd = self.invdelta[tb]
        tlm1 = self.tablength - 1
        it = jnp.clip(((r2 - innersq) * invd).astype(jnp.int32), 0, tlm1 - 1)
        if self.tabstyle == "lookup":
            fpair = self.ft[tb, it]
            e = self.et[tb, it] if eflag else None
            return fpair, e
        rsq_i = self.rsqt[tb, it]
        if self.tabstyle == "linear":
            frac = (r2 - rsq_i) * invd
            fpair = self.ft[tb, it] + frac * self.dft[tb, it]
            e = (self.et[tb, it] + frac * self.det[tb, it]) if eflag \
                else None
            return fpair, e
        # spline
        b = (r2 - rsq_i) * invd
        a = 1.0 - b
        d6 = (self.delta[tb] ** 2) / 6.0
        fpair = (a * self.ft[tb, it] + b * self.ft[tb, it + 1]
                 + ((a**3 - a) * self.f2t[tb, it]
                    + (b**3 - b) * self.f2t[tb, it + 1]) * d6)
        e = None
        if eflag:
            e = (a * self.et[tb, it] + b * self.et[tb, it + 1]
                 + ((a**3 - a) * self.e2t[tb, it]
                    + (b**3 - b) * self.e2t[tb, it + 1]) * d6)
        return fpair, e


def make_pair_table(ntypes, rows, tabstyle, tablength, dtype=jnp.float64):
    """rows[(i,j)] = (file, keyword[, cut]). Replicates read_table +
    spline_table + compute_table exactly."""
    tables = []
    tabidx = np.zeros((ntypes + 1, ntypes + 1), dtype=np.int32)
    cut_tab = np.zeros((ntypes + 1, ntypes + 1))
    for (i, j), row in rows.items():
        rfile, efile, ffile, params = read_pair_table(row[0], row[1])
        cut = float(row[2]) if len(row) > 2 else (
            params["rhi"] if params["rflag"] else rfile[-1])
        n = len(rfile)
        if params["rflag"]:  # resample onto uniform r/rsq from rlo..rhi
            # (ref: read_table: for rflag, rfile entries are checked, not
            # rebuilt — the file already carries the uniform grid)
            pass
        # spline_table
        ep0 = -ffile[0]
        epn = -ffile[n - 1]
        e2file = _nr_spline(rfile, efile, ep0, epn)
        if params["fpflag"]:
            fplo, fphi = params["fplo"], params["fphi"]
        else:
            fplo = (ffile[1] - ffile[0]) / (rfile[1] - rfile[0])
            fphi = (ffile[n - 1] - ffile[n - 2]) / (rfile[n - 1]
                                                    - rfile[n - 2])
        f2file = _nr_spline(rfile, ffile, fplo, fphi)

        tlm1 = tablength - 1
        inner = params["rlo"] if params["rflag"] else rfile[0]
        innersq = inner * inner
        delta = (cut * cut - innersq) / tlm1
        rsq = innersq + np.arange(tablength) * delta
        r = np.sqrt(rsq)
        match = (tabstyle == "linear" and n == tablength
                 and params["rflag"] == "RSQ" and params["rhi"] == cut)
        if match:
            e = efile.copy()
            f = ffile / r
        else:
            e = _nr_splint(rfile, efile, e2file, r)
            f = _nr_splint(rfile, ffile, f2file, r) / r
        de = np.diff(e)
        df = np.diff(f)
        e2 = np.zeros(tablength)
        f2 = np.zeros(tablength)
        if tabstyle == "spline":
            ep0 = -f[0] / (2.0 * np.sqrt(innersq))
            epn = -f[tlm1] / (2.0 * cut)
            e2 = _nr_spline(rsq, e, ep0, epn)
            if params["fpflag"]:
                fp0 = (params["fplo"] / np.sqrt(innersq)
                       - f[0] / innersq) / (2.0 * np.sqrt(innersq))
                fpn = (params["fphi"] / cut - f[tlm1] / (cut * cut)) \
                    / (2.0 * cut)
            else:
                secant = 0.1
                rsq1 = innersq
                rsq2 = rsq1 + secant * delta
                fp0 = (_nr_splint(rfile, ffile, f2file, np.sqrt(rsq2))
                       / np.sqrt(rsq2) - f[0] / np.sqrt(rsq1)) \
                    / (secant * delta)
                rsq2 = cut * cut
                rsq1 = rsq2 - secant * delta
                fpn = (f[tlm1] / np.sqrt(rsq2)
                       - _nr_splint(rfile, ffile, f2file, np.sqrt(rsq1))
                       / np.sqrt(rsq1)) / (secant * delta)
            f2 = _nr_spline(rsq, f, fp0, fpn)
        if tabstyle == "lookup":
            rsq_mid = innersq + (np.arange(tlm1) + 0.5) * delta
            rmid = np.sqrt(rsq_mid)
            e_l = _nr_splint(rfile, efile, e2file, rmid)
            f_l = _nr_splint(rfile, ffile, f2file, rmid) / rmid
            e = np.concatenate([e_l, [0.0]])
            f = np.concatenate([f_l, [0.0]])
            de = np.diff(e)
            df = np.diff(f)
        tables.append((innersq, delta, 1.0 / delta, rsq, e, f,
                       np.concatenate([de, [0.0]]),
                       np.concatenate([df, [0.0]]), e2, f2))
        ti_, tj_ = min(i, j), max(i, j)
        tabidx[ti_, tj_] = tabidx[tj_, ti_] = len(tables) - 1
        cut_tab[ti_, tj_] = cut_tab[tj_, ti_] = cut

    stackf = lambda k: jnp.asarray(np.stack([t[k] for t in tables]),
                                   dtype=dtype)
    return PairTableStyle(
        innersq=stackf(0), delta=stackf(1), invdelta=stackf(2),
        rsqt=stackf(3), et=stackf(4), ft=stackf(5), det=stackf(6),
        dft=stackf(7), e2t=stackf(8), f2t=stackf(9),
        tabidx=jnp.asarray(tabidx),
        cutsq=jnp.asarray(cut_tab * cut_tab, dtype=dtype),
        offset=jnp.asarray(np.zeros_like(cut_tab), dtype=dtype),
        ntypes=ntypes, cut_max=float(cut_tab.max()), tabstyle=tabstyle,
        tablength=tablength)


# ---------------------------------------------------------------------------
# ZBL universal screened nuclear repulsion (ref: src/pair_zbl.cpp,
# src/pair_zbl_const.h)
# ---------------------------------------------------------------------------

_ZBL_C = (0.02817, 0.28022, 0.50986, 0.18175)
_ZBL_D = (0.20162, 0.40290, 0.94229, 3.19980)
_ZBL_P = 0.23
_ZBL_A0 = 0.46850


@_pairstyle(["zze", "ainv"], meta=("ntypes", "cut_max", "cut_inner"))
class PairZBL(_SimplePair):
    """ZBL screening: E = Zi Zj e^2/r * phi(r/a) with the universal
    4-exponential phi, C2-switched to zero between cut_inner and
    cut_global (ref: pair_zbl.cpp:113-141 compute, :480-520 switch
    construction). Special-bond weights are NOT applied by the style
    (the reference's compute never reads factor_lj) — excluded pairs
    vanish only via the neighbor list's special exclusion."""

    zze: Array   # [nt+1, nt+1] Zi Zj qqr2e qe^2
    ainv: Array  # [nt+1, nt+1] 1/a screening length
    cutsq: Array
    offset: Array  # unused
    ntypes: int
    cut_max: float
    cut_inner: float = 0.0

    no_special_lj = True  # see class docstring

    def _ederiv(self, zze, ainv, r):
        """(E, dE/dr, d2E/dr2) of the raw ZBL energy."""
        rinv = 1.0 / r
        s = sp = spp = 0.0
        for ck, dk in zip(_ZBL_C, _ZBL_D):
            da = dk * ainv
            e = ck * jnp.exp(-da * r)
            s = s + e
            sp = sp - da * e
            spp = spp + da * da * e
        E = zze * s * rinv
        dE = zze * (sp * rinv - s * rinv * rinv)
        d2E = zze * (spp * rinv - 2.0 * sp * rinv * rinv
                     + 2.0 * s * rinv ** 3)
        return E, dE, d2E

    def pair_terms(self, r2, ti, tj, eflag):
        zze = self._p(self.zze, ti, tj)
        ainv = self._p(self.ainv, ti, tj)
        rc = self.cut_max
        ci = self.cut_inner
        tc = rc - ci
        r = jnp.sqrt(r2)
        E, dE, _ = self._ederiv(zze, ainv, r)
        fc, fcp, fcpp = self._ederiv(zze, ainv, jnp.asarray(rc, r.dtype))
        swa = (-3.0 * fcp + tc * fcpp) / (tc * tc)
        swb = (2.0 * fcp - tc * fcpp) / (tc ** 3)
        sw5 = -fc + (tc / 2.0) * fcp - (tc * tc / 12.0) * fcpp
        t = r - ci
        fsw = jnp.where(r2 > ci * ci, t * t * (swa + swb * t), 0.0)
        fpair = -(dE + fsw) / r  # ref: fpair *= -1.0/r on dzbldr+fswitch
        e = None
        if eflag:
            esw = jnp.where(r2 > ci * ci,
                            t ** 3 * (swa / 3.0 + (swb / 4.0) * t), 0.0)
            e = E + sw5 + esw
        return fpair, e


def make_zbl(ntypes, coeffs, cut_inner, cut_global, qqr2e,
             qelectron=1.0, dtype=jnp.float64):
    """coeffs[(i,j)] = (zi, zj); z set per i-i, cross terms from z[i],z[j]
    (ref: pair_zbl.cpp coeff/init_one set_coeff)."""
    z = np.zeros(ntypes + 1)
    for (i, j), c in coeffs.items():
        if i == j:
            z[i] = c[0]
    zze = np.zeros((ntypes + 1, ntypes + 1))
    ainv = np.zeros((ntypes + 1, ntypes + 1))
    for i in range(1, ntypes + 1):
        for j in range(1, ntypes + 1):
            zi, zj = z[i], z[j]
            if zi == 0.0 or zj == 0.0:
                continue
            a = _ZBL_A0 / (zi ** _ZBL_P + zj ** _ZBL_P)
            ainv[i, j] = 1.0 / a
            zze[i, j] = zi * zj * qqr2e * qelectron * qelectron
    cutsq = np.full((ntypes + 1, ntypes + 1), cut_global * cut_global)
    return PairZBL(
        zze=jnp.asarray(zze, dtype=dtype),
        ainv=jnp.asarray(ainv, dtype=dtype),
        cutsq=jnp.asarray(cutsq, dtype=dtype),
        offset=jnp.zeros_like(jnp.asarray(cutsq, dtype=dtype)),
        ntypes=ntypes, cut_max=float(cut_global),
        cut_inner=float(cut_inner))


# ---------------------------------------------------------------------------
# MDF-tapered pair styles: lj/mdf, lennard/mdf, buck/mdf
# (ref: src/EXTRA-PAIR/pair_lj_mdf.cpp:100-130 taper; pair_buck_mdf.cpp,
# pair_lennard_mdf.cpp share it)
# ---------------------------------------------------------------------------


def _mdf_taper(r2, r, ci, rc):
    """(tt, dt): the MDF taper and MINUS its derivative premultiplied by r
    (ref: pair_lj_mdf.cpp tt/dt)."""
    dp = rc - ci
    d = (r - ci) / dp
    dd = 1.0 - d
    tt = (1.0 + 3.0 * d + 6.0 * d * d) * dd ** 3
    dt = 30.0 * d * d * dd * dd * r / dp
    inside = r2 <= ci * ci
    return jnp.where(inside, 1.0, tt), jnp.where(inside, 0.0, dt)


@_pairstyle(["eps", "sig"], meta=("ntypes", "cut_max", "cut_inner"))
class PairLJMDF(_SimplePair):
    """12-6 LJ x MDF taper (ref: pair_lj_mdf.cpp)."""

    eps: Array
    sig: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float
    cut_inner: float = 0.0

    def pair_terms(self, r2, ti, tj, eflag):
        eps = self._p(self.eps, ti, tj)
        sig = self._p(self.sig, ti, tj)
        r2inv = 1.0 / r2
        s6 = sig ** 6
        r6inv = r2inv ** 3 * s6
        forcelj = r6inv * (48.0 * eps * r6inv - 24.0 * eps)
        philj = r6inv * (4.0 * eps * r6inv - 4.0 * eps)
        r = jnp.sqrt(r2)
        tt, dt = _mdf_taper(r2, r, self.cut_inner, self.cut_max)
        fpair = (forcelj * tt + philj * dt) * r2inv
        e = philj * tt if eflag else None
        return fpair, e


@_pairstyle(["aa", "bb"], meta=("ntypes", "cut_max", "cut_inner"))
class PairLennardMDF(_SimplePair):
    """AB-form 12-6 (E = A/r^12 - B/r^6) x MDF taper
    (ref: pair_lennard_mdf.cpp)."""

    aa: Array
    bb: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float
    cut_inner: float = 0.0

    def pair_terms(self, r2, ti, tj, eflag):
        A = self._p(self.aa, ti, tj)
        B = self._p(self.bb, ti, tj)
        r2inv = 1.0 / r2
        r6inv = r2inv ** 3
        forcelj = r6inv * (12.0 * A * r6inv - 6.0 * B)
        philj = r6inv * (A * r6inv - B)
        r = jnp.sqrt(r2)
        tt, dt = _mdf_taper(r2, r, self.cut_inner, self.cut_max)
        return (forcelj * tt + philj * dt) * r2inv, \
            (philj * tt if eflag else None)


@_pairstyle(["a", "rho", "c"], meta=("ntypes", "cut_max", "cut_inner"))
class PairBuckMDF(_SimplePair):
    """Buckingham x MDF taper (ref: pair_buck_mdf.cpp)."""

    a: Array
    rho: Array
    c: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float
    cut_inner: float = 0.0

    def pair_terms(self, r2, ti, tj, eflag):
        A = self._p(self.a, ti, tj)
        rho = self._p(self.rho, ti, tj)
        C = self._p(self.c, ti, tj)
        r2inv = 1.0 / r2
        r6inv = r2inv ** 3
        r = jnp.sqrt(r2)
        ex = A * jnp.exp(-r / rho)
        forcebuck = ex * r / rho - 6.0 * C * r6inv
        phibuck = ex - C * r6inv
        tt, dt = _mdf_taper(r2, r, self.cut_inner, self.cut_max)
        return (forcebuck * tt + phibuck * dt) * r2inv, \
            (phibuck * tt if eflag else None)


def make_mdf(kind, ntypes, coeffs, cut_inner, cut_global,
             dtype=jnp.float64, mix="geometric"):
    cls, ncoeff = {"lj": (PairLJMDF, 2), "lennard": (PairLennardMDF, 2),
                   "buck": (PairBuckMDF, 3)}[kind]
    mixer = _std_mixer(mix)
    tabs, cut = _mix_tables(ntypes, coeffs, ncoeff, cut_global, mixer,
                            mix=mix)
    return _finish(cls, ntypes, tabs, cut, dtype,
                   cut_inner=float(cut_inner))


@_pairstyle(["d0", "alpha", "r0"])
class PairMorseSmoothLinear(_SimplePair):
    """Morse, linear-smoothed to zero force+energy at the cutoff
    (ref: src/EXTRA-PAIR/pair_morse_smooth_linear.cpp)."""

    d0: Array
    alpha: Array
    r0: Array
    cutsq: Array
    offset: Array  # unused (the linear smoothing replaces offsets)
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        D = self._p(self.d0, ti, tj)
        a = self._p(self.alpha, ti, tj)
        r0 = self._p(self.r0, ti, tj)
        rc = jnp.sqrt(self._p(self.cutsq, ti, tj))
        r = jnp.sqrt(r2)

        def de(rr):
            ex = jnp.exp(-a * (rr - r0))
            e = D * (ex * ex - 2.0 * ex)
            dedr = D * (-2.0 * a * ex * ex + 2.0 * a * ex)
            return e, dedr

        e_r, de_r = de(r)
        e_c, de_c = de(rc)
        fpair = (-(de_r) + de_c) / r
        e = (e_r - e_c - (r - rc) * de_c) if eflag else None
        return fpair, e


def make_morse_smooth_linear(ntypes, coeffs, cut_global,
                             dtype=jnp.float64, mix="geometric"):
    return _mk(PairMorseSmoothLinear, ntypes, coeffs, 3, cut_global,
               _std_mixer(mix), dtype, mix=mix)
