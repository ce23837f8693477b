"""Simple two-body pair styles: morse, buck, yukawa, gauss, born.

TPU-native re-implementations of the corresponding reference styles
(ref: src/pair_morse.cpp, src/pair_buck.cpp, src/pair_yukawa.cpp,
src/pair_gauss.cpp, src/pair_born.cpp), all expressed through the shared
gather/mask/reduce engine in models/pair.py (`pair_terms` interface).
Coefficient tables are [ntypes+1, ntypes+1]; per-pair cutoffs mix like
distances when unset.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pair import mix_sigma

Array = jax.Array


def _build_tables(ntypes, coeffs, ncoeff, cut_global, mix="geometric",
                  mix_fn=None):
    """Generic coeff/cut tables; unset cross terms require explicit entries
    unless mix_fn supplies them."""
    tabs = [np.zeros((ntypes + 1, ntypes + 1)) for _ in range(ncoeff)]
    cut = np.full((ntypes + 1, ntypes + 1), cut_global)
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
                if mix_fn is None:
                    raise ValueError(
                        f"pair coeff ({i},{j}) not set and no mixing rule"
                    )
                vals = mix_fn(
                    [tabs[t][i, i] for t in range(ncoeff)],
                    [tabs[t][j, j] for t in range(ncoeff)],
                )
                for t in range(ncoeff):
                    tabs[t][i, j] = vals[t]
                cut[i, j] = mix_sigma(cut[i, i], cut[j, j], mix)
    for a in tabs + [cut]:
        for i in range(1, ntypes + 1):
            for j in range(i + 1, ntypes + 1):
                a[j, i] = a[i, j]
    return tabs, cut


class _SimplePair:
    """Shared plumbing: cutsq table, generic compute via pair_terms."""

    def cutsq_table(self) -> Array:
        return self.cutsq

    def max_cutoff(self) -> float:
        return self.cut_max

    def compute(self, state, nl, eflag, vflag, special_lj=None,
                special_coul=None):
        from .pair import compute as compute_simple

        return compute_simple(self, state, nl, eflag, vflag,
                              special_lj=special_lj,
                              special_coul=special_coul)

    def _p(self, tab, ti, tj):
        return tab[1, 1] if self.ntypes == 1 else tab[ti, tj]


@partial(jax.tree_util.register_dataclass,
         data_fields=["d0", "alpha", "r0", "cutsq", "offset"],
         meta_fields=["ntypes", "cut_max"])
@dataclasses.dataclass(frozen=True)
class PairMorse(_SimplePair):
    """E = D0 [e^{-2a(r-r0)} - 2 e^{-a(r-r0)}] (ref: src/pair_morse.cpp)."""

    d0: Array
    alpha: Array
    r0: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        d0 = self._p(self.d0, ti, tj)
        al = self._p(self.alpha, ti, tj)
        r0 = self._p(self.r0, ti, tj)
        off = self._p(self.offset, ti, tj)
        r = jnp.sqrt(r2)
        dexp = jnp.exp(-al * (r - r0))
        fpair = 2.0 * d0 * al * (dexp * dexp - dexp) / r
        e = d0 * (dexp * dexp - 2.0 * dexp) - off if eflag else None
        return fpair, e


@partial(jax.tree_util.register_dataclass,
         data_fields=["a", "rho", "c", "cutsq", "offset"],
         meta_fields=["ntypes", "cut_max"])
@dataclasses.dataclass(frozen=True)
class PairBuck(_SimplePair):
    """E = A e^{-r/rho} - C/r^6 (ref: src/pair_buck.cpp)."""

    a: Array
    rho: Array
    c: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        a = self._p(self.a, ti, tj)
        rho = self._p(self.rho, ti, tj)
        c = self._p(self.c, ti, tj)
        off = self._p(self.offset, ti, tj)
        r = jnp.sqrt(r2)
        r2inv = 1.0 / r2
        r6inv = r2inv * r2inv * r2inv
        rexp = jnp.exp(-r / rho)
        forcebuck = a / rho * r * rexp - 6.0 * c * r6inv
        fpair = forcebuck * r2inv
        e = a * rexp - c * r6inv - off if eflag else None
        return fpair, e


@partial(jax.tree_util.register_dataclass,
         data_fields=["a", "cutsq", "offset"],
         meta_fields=["ntypes", "cut_max", "kappa"])
@dataclasses.dataclass(frozen=True)
class PairYukawa(_SimplePair):
    """E = A e^{-kappa r}/r (ref: src/pair_yukawa.cpp)."""

    a: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float
    kappa: float = 1.0

    def pair_terms(self, r2, ti, tj, eflag):
        a = self._p(self.a, ti, tj)
        off = self._p(self.offset, ti, tj)
        r = jnp.sqrt(r2)
        rinv = 1.0 / r
        screening = jnp.exp(-self.kappa * r)
        forceyukawa = a * screening * (self.kappa + rinv)
        fpair = forceyukawa / r2
        e = a * screening * rinv - off if eflag else None
        return fpair, e


@partial(jax.tree_util.register_dataclass,
         data_fields=["a", "b", "cutsq", "offset"],
         meta_fields=["ntypes", "cut_max"])
@dataclasses.dataclass(frozen=True)
class PairGauss(_SimplePair):
    """E = -A e^{-B r^2} (ref: src/pair_gauss.cpp)."""

    a: Array
    b: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        a = self._p(self.a, ti, tj)
        b = self._p(self.b, ti, tj)
        off = self._p(self.offset, ti, tj)
        g = jnp.exp(-b * r2)
        fpair = -2.0 * a * b * g
        e = -a * g - off if eflag else None
        return fpair, e


def _finish(cls, tabs, cut, ntypes, dtype, extra_meta=None, shift_energy=None):
    cutsq = cut * cut
    offset = np.zeros_like(cut)
    if shift_energy is not None:
        for i in range(1, ntypes + 1):
            for j in range(1, ntypes + 1):
                offset[i, j] = shift_energy(
                    [t[i, j] for t in tabs], cut[i, j]
                )
    args = [jnp.asarray(t, dtype=dtype) for t in tabs]
    kw = dict(extra_meta or {})
    return cls(*args, jnp.asarray(cutsq, dtype=dtype),
               jnp.asarray(offset, dtype=dtype),
               ntypes=ntypes, cut_max=float(cut[1:, 1:].max()), **kw)


def make_morse(ntypes, coeffs, cut_global, shift=False, dtype=jnp.float64):
    tabs, cut = _build_tables(ntypes, coeffs, 3, cut_global)
    se = None
    if shift:
        def se(t, c):
            d0, al, r0 = t
            dexp = np.exp(-al * (c - r0))
            return d0 * (dexp * dexp - 2 * dexp)
    return _finish(PairMorse, tabs, cut, ntypes, dtype, shift_energy=se)


def make_buck(ntypes, coeffs, cut_global, shift=False, dtype=jnp.float64):
    tabs, cut = _build_tables(ntypes, coeffs, 3, cut_global)
    se = None
    if shift:
        def se(t, c):
            a, rho, cc = t
            return a * np.exp(-c / rho) - cc / c**6
    return _finish(PairBuck, tabs, cut, ntypes, dtype, shift_energy=se)


def make_yukawa(ntypes, kappa, coeffs, cut_global, shift=False,
                dtype=jnp.float64):
    tabs, cut = _build_tables(
        ntypes, coeffs, 1, cut_global,
        mix_fn=lambda a, b: [float(np.sqrt(a[0] * b[0]))],
    )
    se = None
    if shift:
        def se(t, c):
            return t[0] * np.exp(-kappa * c) / c
    return _finish(PairYukawa, tabs, cut, ntypes, dtype,
                   extra_meta={"kappa": float(kappa)}, shift_energy=se)


def make_gauss(ntypes, coeffs, cut_global, shift=False, mix="geometric",
               dtype=jnp.float64):
    def mix_fn(ci, cj):
        # ref: PairGauss::init_one — widths mix as distances, heights as
        # energies
        ai, bi = ci
        aj, bj = cj
        si = np.sqrt(0.5 / abs(bi))
        sj = np.sqrt(0.5 / abs(bj))
        sij = mix_sigma(si, sj, mix)
        return [float(np.sqrt(abs(ai) * abs(aj))), float(0.5 / (sij * sij))]

    tabs, cut = _build_tables(ntypes, coeffs, 2, cut_global, mix=mix,
                              mix_fn=mix_fn)
    se = None
    if shift:
        def se(t, c):
            return -t[0] * np.exp(-t[1] * c * c)
    return _finish(PairGauss, tabs, cut, ntypes, dtype, shift_energy=se)


@partial(jax.tree_util.register_dataclass,
         data_fields=["a", "rho", "sigma", "c", "d", "cutsq", "offset"],
         meta_fields=["ntypes", "cut_max"])
@dataclasses.dataclass(frozen=True)
class PairBorn(_SimplePair):
    """Born-Mayer-Huggins: E = A e^{(sigma-r)/rho} - C/r^6 + D/r^8
    (ref: src/pair_born.cpp:117-133)."""

    a: Array
    rho: Array
    sigma: Array
    c: Array
    d: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        a = self._p(self.a, ti, tj)
        rho = self._p(self.rho, ti, tj)
        sg = self._p(self.sigma, ti, tj)
        c = self._p(self.c, ti, tj)
        d = self._p(self.d, ti, tj)
        off = self._p(self.offset, ti, tj)
        r = jnp.sqrt(r2)
        r2inv = 1.0 / r2
        r6inv = r2inv * r2inv * r2inv
        rexp = jnp.exp((sg - r) / rho)
        forceborn = (a / rho * r * rexp - 6.0 * c * r6inv
                     + 8.0 * d * r6inv * r2inv)
        fpair = forceborn * r2inv
        e = (a * rexp - c * r6inv + d * r6inv * r2inv - off
             if eflag else None)
        return fpair, e


@partial(jax.tree_util.register_dataclass,
         data_fields=["eps", "sigma", "delta", "cutsq", "offset"],
         meta_fields=["ntypes", "cut_max"])
@dataclasses.dataclass(frozen=True)
class PairLJExpand(_SimplePair):
    """LJ on the radially shifted distance r - delta
    (ref: src/pair_lj_expand.cpp; shift mixes arithmetically)."""

    eps: Array
    sigma: Array
    delta: Array
    cutsq: Array
    offset: Array
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        e4 = 4.0 * self._p(self.eps, ti, tj)
        sg = self._p(self.sigma, ti, tj)
        dl = self._p(self.delta, ti, tj)
        off = self._p(self.offset, ti, tj)
        r = jnp.sqrt(r2)
        rs = r - dl
        s6 = (sg / rs) ** 6
        forcelj = e4 * (12.0 * s6 * s6 - 6.0 * s6) / rs
        fpair = forcelj / r
        e = e4 * (s6 * s6 - s6) - off if eflag else None
        return fpair, e


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "cutsq", "offset"],
         meta_fields=["ntypes", "cut_max"])
@dataclasses.dataclass(frozen=True)
class PairHarmonicCut(_SimplePair):
    """E = k (rc - r)^2, zero beyond rc
    (ref: src/EXTRA-PAIR/pair_harmonic_cut.cpp)."""

    k: Array
    cutsq: Array
    offset: Array  # unused (the form vanishes at rc by construction)
    ntypes: int
    cut_max: float

    def pair_terms(self, r2, ti, tj, eflag):
        k = self._p(self.k, ti, tj)
        rc = jnp.sqrt(self._p(self.cutsq, ti, tj))
        r = jnp.sqrt(r2)
        delta = rc - r
        fpair = 2.0 * k * delta / r
        e = k * delta * delta if eflag else None
        return fpair, e


def make_born(ntypes, coeffs, cut_global, shift=False, dtype=jnp.float64):
    tabs, cut = _build_tables(ntypes, coeffs, 5, cut_global)
    se = None
    if shift:
        def se(t, c):
            a, rho, sg, cc, d = t
            return a * np.exp((sg - c) / rho) - cc / c**6 + d / c**8
    return _finish(PairBorn, tabs, cut, ntypes, dtype, shift_energy=se)


def make_lj_expand(ntypes, coeffs, cut_global, shift=False, mix="geometric",
                   dtype=jnp.float64):
    from .pair import mix_epsilon

    def mix_fn(ci, cj):
        e1, s1, d1 = ci
        e2, s2, d2 = cj
        return [mix_epsilon(e1, e2, s1, s2, mix), mix_sigma(s1, s2, mix),
                0.5 * (d1 + d2)]  # shift always arithmetic (init_one:230)

    tabs, cut = _build_tables(ntypes, coeffs, 3, cut_global, mix=mix,
                              mix_fn=mix_fn)
    # the effective range extends by the radial shift: the reference's
    # init_one returns cut + delta and the force test uses ITS square
    cut = cut + tabs[2]
    se = None
    if shift:
        def se(t, c):
            e, sg, dl = t
            s6 = (sg / (c - dl)) ** 6
            return 4.0 * e * (s6 * s6 - s6)
    return _finish(PairLJExpand, tabs, cut, ntypes, dtype, shift_energy=se)


def make_harmonic_cut(ntypes, coeffs, mix="geometric", dtype=jnp.float64):
    """coeffs: {(i, j): (k, rc)}; rc rides the per-pair cutoff slot;
    k mixes as an energy, rc as a distance (ref: init_one:189-194)."""
    def mix_fn(ci, cj):
        return [float(np.sqrt(ci[0] * cj[0]))]

    tabs, cut = _build_tables(ntypes, coeffs, 1, 0.0, mix=mix,
                              mix_fn=mix_fn)
    return _finish(PairHarmonicCut, tabs, cut, ntypes, dtype)
