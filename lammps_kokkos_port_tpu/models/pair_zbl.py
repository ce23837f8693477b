"""Pair styles zbl and hybrid/overlay.

zbl: Ziegler-Biersack-Littmark universal screened nuclear repulsion with
the reference's exact polynomial switching between inner and outer cutoffs
(ref: src/pair_zbl.cpp compute/set_coeff, constants src/pair_zbl_const.h).

hybrid/overlay: stacks multiple sub-styles over all pairs, summing their
contributions (ref: src/pair_hybrid.cpp / hybrid/overlay semantics; the
skip-list machinery is unnecessary here — each sub-style applies its own
cutoff mask over the shared FULL list).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# ref: src/pair_zbl_const.h
PZBL = 0.23
A0 = 0.46850
CS = (0.02817, 0.28022, 0.50986, 0.18175)
DS = (0.20162, 0.40290, 0.94229, 3.19980)


def _e_zbl(r, d1a, d2a, d3a, d4a, zze):
    s = (CS[0] * jnp.exp(-d1a * r) + CS[1] * jnp.exp(-d2a * r)
         + CS[2] * jnp.exp(-d3a * r) + CS[3] * jnp.exp(-d4a * r))
    return zze * s / r


def _np_e_zbl(r, d, zze):
    s = sum(c * np.exp(-di * r) for c, di in zip(CS, d))
    return zze * s / r


def _np_dzbldr(r, d, zze):
    rinv = 1.0 / r
    s = sum(c * np.exp(-di * r) for c, di in zip(CS, d))
    sp = sum(-c * di * np.exp(-di * r) for c, di in zip(CS, d))
    return zze * (sp - s * rinv) * rinv


def _np_d2zbldr2(r, d, zze):
    rinv = 1.0 / r
    s = sum(c * np.exp(-di * r) for c, di in zip(CS, d))
    sp = sum(-c * di * np.exp(-di * r) for c, di in zip(CS, d))
    spp = sum(c * di * di * np.exp(-di * r) for c, di in zip(CS, d))
    return zze * (spp - 2.0 * sp * rinv + 2.0 * s * rinv * rinv) * rinv


@partial(jax.tree_util.register_dataclass,
         data_fields=["d1a", "d2a", "d3a", "d4a", "zze",
                      "sw1", "sw2", "sw3", "sw4", "sw5", "cutsq"],
         meta_fields=["ntypes", "cut_inner", "cut_global"])
@dataclasses.dataclass(frozen=True)
class PairZBL:
    d1a: Array
    d2a: Array
    d3a: Array
    d4a: Array
    zze: Array
    sw1: Array
    sw2: Array
    sw3: Array
    sw4: Array
    sw5: Array
    cutsq: Array
    ntypes: int
    cut_inner: float
    cut_global: float

    def cutsq_table(self) -> Array:
        return self.cutsq

    def max_cutoff(self) -> float:
        return self.cut_global

    def _p(self, tab, ti, tj):
        return tab[1, 1] if self.ntypes == 1 else tab[ti, tj]

    def pair_terms(self, r2, ti, tj, eflag):
        r = jnp.sqrt(r2)
        d1a = self._p(self.d1a, ti, tj)
        d2a = self._p(self.d2a, ti, tj)
        d3a = self._p(self.d3a, ti, tj)
        d4a = self._p(self.d4a, ti, tj)
        zze = self._p(self.zze, ti, tj)
        rinv = 1.0 / r
        exps = [jnp.exp(-d * r) for d in (d1a, d2a, d3a, d4a)]
        s = sum(c * e for c, e in zip(CS, exps))
        sp = sum(-c * d * e for c, d, e in
                 zip(CS, (d1a, d2a, d3a, d4a), exps))
        e_z = zze * s * rinv
        dz = zze * (sp - s * rinv) * rinv  # dE/dr
        t = r - self.cut_inner
        in_switch = r2 > self.cut_inner**2
        fsw = t * t * (self._p(self.sw1, ti, tj)
                       + self._p(self.sw2, ti, tj) * t)
        dEdr = dz + jnp.where(in_switch, fsw, 0.0)
        fpair = -dEdr * rinv
        e = None
        if eflag:
            esw = t**3 * (self._p(self.sw3, ti, tj)
                          + self._p(self.sw4, ti, tj) * t)
            e = e_z + self._p(self.sw5, ti, tj) + jnp.where(in_switch, esw, 0.0)
        return fpair, e

    def compute(self, state, nl, eflag, vflag, special_lj=None,
                special_coul=None):
        from .pair import compute as compute_simple

        return compute_simple(self, state, nl, eflag, vflag,
                              special_lj=special_lj,
                              special_coul=special_coul)


def make_zbl(ntypes: int, cut_inner: float, cut_global: float,
             z_of_type: dict[int, float], qqr2e: float = 14.399645,
             qelectron: float = 1.0, dtype=jnp.float64) -> PairZBL:
    """pair_style zbl inner outer; pair_coeff i j Zi Zj."""
    nt = ntypes
    shape = (nt + 1, nt + 1)
    d1a = np.zeros(shape)
    d2a = np.zeros(shape)
    d3a = np.zeros(shape)
    d4a = np.zeros(shape)
    zze = np.zeros(shape)
    sws = [np.zeros(shape) for _ in range(5)]
    for i in range(1, nt + 1):
        for j in range(1, nt + 1):
            zi = z_of_type[i]
            zj = z_of_type[j]
            ainv = (zi**PZBL + zj**PZBL) / A0
            d = [di * ainv for di in DS]
            d1a[i, j], d2a[i, j], d3a[i, j], d4a[i, j] = d
            zz = zi * zj * qqr2e * qelectron * qelectron
            zze[i, j] = zz
            tc = cut_global - cut_inner
            fc = _np_e_zbl(cut_global, d, zz)
            fcp = _np_dzbldr(cut_global, d, zz)
            fcpp = _np_d2zbldr2(cut_global, d, zz)
            swa = (-3.0 * fcp + tc * fcpp) / (tc * tc)
            swb = (2.0 * fcp - tc * fcpp) / (tc**3)
            swc = -fc + (tc / 2.0) * fcp - (tc * tc / 12.0) * fcpp
            sws[0][i, j] = swa
            sws[1][i, j] = swb
            sws[2][i, j] = swa / 3.0
            sws[3][i, j] = swb / 4.0
            sws[4][i, j] = swc
    cutsq = np.full(shape, cut_global * cut_global)
    asd = lambda a: jnp.asarray(a, dtype=dtype)
    return PairZBL(
        d1a=asd(d1a), d2a=asd(d2a), d3a=asd(d3a), d4a=asd(d4a), zze=asd(zze),
        sw1=asd(sws[0]), sw2=asd(sws[1]), sw3=asd(sws[2]), sw4=asd(sws[3]),
        sw5=asd(sws[4]), cutsq=asd(cutsq),
        ntypes=nt, cut_inner=float(cut_inner), cut_global=float(cut_global),
    )


@partial(jax.tree_util.register_dataclass,
         data_fields=["styles", "pairmask"], meta_fields=["ntypes"])
@dataclasses.dataclass(frozen=True)
class PairHybrid:
    """pair_style hybrid: one sub-style per type pair
    (ref: src/pair_hybrid.cpp:90-240 — sub-lists become per-pair masks on
    the shared FULL list here).

    pairmask: [nstyles, nt+1, nt+1] 0/1 selecting which pairs each
    sub-style handles.
    """

    styles: tuple
    pairmask: Array
    ntypes: int

    def cutsq_table(self) -> Array:
        tabs = [s.cutsq_table() * self.pairmask[k]
                for k, s in enumerate(self.styles)]
        out = tabs[0]
        for t in tabs[1:]:
            out = jnp.maximum(out, t)
        return out

    def max_cutoff(self) -> float:
        return max(s.max_cutoff() for s in self.styles)

    def compute(self, state, nl, eflag, vflag, special_lj=None,
                special_coul=None):
        f, ev, ec, virial = self.compute_detailed(
            state, nl, eflag, vflag, special_lj=special_lj,
            special_coul=special_coul)
        pe = (ev + ec) if eflag else None
        return f, pe, virial

    def compute_detailed(self, state, nl, eflag, vflag, special_lj=None,
                         special_coul=None):
        f = jnp.zeros_like(state.x)
        ev = jnp.zeros((), state.dtype)
        ec = jnp.zeros((), state.dtype)
        virial = jnp.zeros(6, state.dtype) if vflag else None
        for k, s in enumerate(self.styles):
            # mask the sub-style's cutoffs to its assigned type pairs
            masked = _mask_style(s, self.pairmask[k])
            fs, es, cs, vs = _sub_compute(masked, state, nl, eflag, vflag,
                                          special_lj, special_coul)
            f = f + fs
            if eflag:
                if es is not None:
                    ev = ev + es
                if cs is not None:
                    ec = ec + cs
            if vflag and vs is not None:
                virial = virial + vs
        return f, (ev if eflag else None), (ec if eflag else None), virial


def make_hybrid(ntypes: int, assignments: list) -> PairHybrid:
    """assignments: list of (style, [(i, j), ...]) with 1-based type pairs
    ('*' handled by the caller expanding to all)."""
    import numpy as np

    masks = []
    styles = []
    for style, pairs in assignments:
        m = np.zeros((ntypes + 1, ntypes + 1))
        for (i, j) in pairs:
            m[i, j] = 1.0
            m[j, i] = 1.0
        masks.append(m)
        styles.append(style)
    return PairHybrid(styles=tuple(styles),
                      pairmask=jnp.asarray(np.stack(masks)), ntypes=ntypes)


def _mask_style(s, mask):
    """Restrict a sub-style to its assigned type pairs by zeroing its
    per-pair cutoffs (the shared-list analog of pair_hybrid's sub-style
    skip lists, ref: src/pair_hybrid.cpp:90-240). mask=None disables."""
    import dataclasses as _dc

    if mask is None:
        return s
    if not hasattr(s, "cutsq"):
        raise TypeError(
            f"pair hybrid sub-style {type(s).__name__} has no cutsq table "
            "to mask — unsupported under hybrid")
    return _dc.replace(s, cutsq=s.cutsq_table() * mask)


def _sub_compute(s, state, nl, eflag, vflag, special_lj, special_coul):
    """(f, evdwl, ecoul, virial) from a sub-style, whatever its surface."""
    if hasattr(s, "compute_detailed"):
        return s.compute_detailed(state, nl, eflag, vflag,
                                  special_lj=special_lj,
                                  special_coul=special_coul)
    try:
        f, pe, v = s.compute(state, nl, eflag, vflag,
                             special_lj=special_lj,
                             special_coul=special_coul)
    except TypeError:
        f, pe, v = s.compute(state, nl, eflag, vflag)
    ecat = getattr(s, "energy_category", "vdwl")
    if ecat == "coul":
        return f, None, pe, v
    return f, pe, None, v


@partial(jax.tree_util.register_dataclass,
         data_fields=["styles", "pairmask"], meta_fields=["ntypes"])
@dataclasses.dataclass(frozen=True)
class PairHybridOverlay:
    """Sum of sub-style contributions over the shared neighbor list
    (ref: pair_hybrid.cpp hybrid/overlay). pairmask (optional
    [nstyles, nt+1, nt+1]) carries `pair_coeff i j none` exclusions —
    a none row removes the pair from EVERY sub-style."""

    styles: tuple
    ntypes: int
    pairmask: Array | None = None

    def cutsq_table(self) -> Array:
        tabs = [s.cutsq_table() * (1.0 if self.pairmask is None
                                   else self.pairmask[k])
                for k, s in enumerate(self.styles)]
        out = tabs[0]
        for t in tabs[1:]:
            out = jnp.maximum(out, t)
        return out

    def max_cutoff(self) -> float:
        return max(s.max_cutoff() for s in self.styles)

    def compute(self, state, nl, eflag, vflag, special_lj=None,
                special_coul=None):
        f, ev, ec, virial = self.compute_detailed(
            state, nl, eflag, vflag, special_lj=special_lj,
            special_coul=special_coul)
        pe = (ev + ec) if eflag else None
        return f, pe, virial

    def compute_detailed(self, state, nl, eflag, vflag, special_lj=None,
                         special_coul=None):
        f = jnp.zeros_like(state.x)
        ev = jnp.zeros((), state.dtype)
        ec = jnp.zeros((), state.dtype)
        virial = jnp.zeros(6, state.dtype) if vflag else None
        for k, s in enumerate(self.styles):
            masked = _mask_style(
                s, None if self.pairmask is None else self.pairmask[k])
            fs, es, cs, vs = _sub_compute(masked, state, nl, eflag, vflag,
                                          special_lj, special_coul)
            f = f + fs
            if eflag:
                if es is not None:
                    ev = ev + es
                if cs is not None:
                    ec = ec + cs
            if vflag and vs is not None:
                virial = virial + vs
        return f, (ev if eflag else None), (ec if eflag else None), virial
