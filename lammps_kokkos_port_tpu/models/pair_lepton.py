"""LEPTON-package pair styles: pair lepton and pair lepton/coul.

The reference compiles per-type-pair algebraic strings into potentials
differentiated symbolically (ref: src/LEPTON/pair_lepton.cpp,
src/LEPTON/pair_lepton_coul.cpp). Here each unique expression becomes a
jax-traceable U(r[, qi, qj]) via utils/lepton, evaluated over the whole
pair tensor and selected per type pair; forces come from autodiff —
identical to the symbolic derivative at fp roundoff for these smooth
closed forms.

pair lepton applies factor_lj to force AND energy; pair lepton/coul
applies factor_coul to both (ref: pair_lepton_coul.cpp:136,153) — both
handled by the generic special plumbing (force) plus the style tallying
the weighted energy itself is unnecessary because models/pair.compute
weights the energy too.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.lepton import lepton_fn
from .pair import gather_pairs, tally_virial

Array = jax.Array


def _dedupe(coeffs: dict, ntypes: int, cut_global: float):
    """coeffs[(i,j)] = expr string | (expr, cut) -> (unique exprs,
    [nt+1,nt+1] index map; -1 where unset, [nt+1,nt+1] cutoffs)."""
    exprs: list[str] = []
    emap = np.full((ntypes + 1, ntypes + 1), -1, dtype=np.int32)
    cut = np.full((ntypes + 1, ntypes + 1), float(cut_global))
    for (i, j), ex in coeffs.items():
        c = cut_global
        if isinstance(ex, tuple):
            ex, c = ex
            c = cut_global if c is None else c
        ex = ex.strip()
        if ex not in exprs:
            exprs.append(ex)
        k = exprs.index(ex)
        emap[i, j] = emap[j, i] = k
        cut[i, j] = cut[j, i] = c
    return tuple(exprs), emap, cut


@partial(jax.tree_util.register_dataclass,
         data_fields=["emap", "cutsq", "eshift"],
         meta_fields=["exprs", "ntypes", "cut_max", "coul", "shift",
                      "qqr2e"])
@dataclasses.dataclass(frozen=True)
class PairLepton:
    """pair_style lepton [cut] / lepton/coul [cut]."""

    emap: Array    # [nt+1, nt+1] int expression index
    cutsq: Array   # [nt+1, nt+1]
    eshift: Array  # [nexpr] energy at the cutoff (pair_modify shift)
    exprs: tuple
    ntypes: int
    cut_max: float
    coul: bool = False
    shift: bool = False
    qqr2e: float = 0.0  # nonzero enables the zbl() extension fn

    def cutsq_table(self) -> Array:
        return self.cutsq

    def max_cutoff(self) -> float:
        return self.cut_max

    def _ext_fns(self):
        if not self.qqr2e:
            return None
        from ..utils.lepton import zbl_expr_fn

        return {"zbl": zbl_expr_fn(self.qqr2e)}

    def _eval(self, eid, r, qi=None, qj=None, qqrd2e=1.0):
        """(energy, -dU/dr / r) per pair, selected by expression id."""
        e_tot = jnp.zeros_like(r)
        fp_tot = jnp.zeros_like(r)
        fns = self._ext_fns()
        for k, ex in enumerate(self.exprs):
            u = lepton_fn(ex, fns=fns)
            if self.coul:
                # the reference binds qi/qj PRE-SCALED by sqrt(qqrd2e)
                # (ref: pair_lepton_coul.cpp:78,134) — the expression text
                # "qi*qj/r" then lands in energy units, while any non-q
                # term (e.g. the lj sub-expression) stays unscaled
                def u1(rr, a, b):
                    return u(r=rr, qi=a, qj=b)
                e_k, de_k = jax.vmap(jax.value_and_grad(u1),
                                     in_axes=(0, 0, 0))(
                    r.reshape(-1), qi.reshape(-1), qj.reshape(-1))
            else:
                def u1(rr):
                    return u(r=rr)
                e_k, de_k = jax.vmap(jax.value_and_grad(u1))(r.reshape(-1))
            e_k = e_k.reshape(r.shape)
            de_k = de_k.reshape(r.shape)
            sel = eid == k
            if self.shift and not self.coul:
                e_k = e_k - self.eshift[k]
            e_tot = jnp.where(sel, e_k, e_tot)
            fp_tot = jnp.where(sel, -de_k / r, fp_tot)
        return e_tot, fp_tot

    def compute(self, state, nl, eflag, vflag, special_lj=None,
                special_coul=None):
        f, ev, ec, vir = self.compute_detailed(
            state, nl, eflag, vflag, special_lj, special_coul)
        if eflag:
            return f, ev + ec, vir
        return f, None, vir

    def compute_detailed(self, state, nl, eflag, vflag, special_lj=None,
                         special_coul=None):
        dt = state.dtype
        j, jc, pair_valid, dx, r2 = gather_pairs(state, nl)
        ti = state.type[:, None]
        tj = state.type[jc]
        cutsq = self.cutsq[ti, tj]
        valid = pair_valid & (r2 < cutsq) & (self.emap[ti, tj] >= 0)
        r2s = jnp.where(valid, r2, jnp.ones((), dt))
        r = jnp.sqrt(r2s)
        eid = self.emap[ti, tj]
        if self.coul:
            from .pair_charmm import _qqrd2e

            q2e = jnp.sqrt(jnp.asarray(_qqrd2e(state), dt))
            qi = jnp.broadcast_to((q2e * state.q)[:, None], r.shape)
            qj = q2e * state.q[jc]
            e, fp = self._eval(eid, r, qi, qj)
            w = (jnp.asarray(special_coul, dt)[nl.sb]
                 if nl.sb is not None and special_coul is not None else 1.0)
        else:
            e, fp = self._eval(eid, r)
            w = (jnp.asarray(special_lj, dt)[nl.sb]
                 if nl.sb is not None and special_lj is not None else 1.0)
        fp = jnp.where(valid, fp * w, 0.0)
        e = jnp.where(valid, e * w, 0.0)
        f = jnp.sum(dx * fp[..., None], axis=1)
        owned = state.owned_mask[:, None]
        tot = 0.5 * jnp.sum(jnp.where(owned, e, 0.0)) if eflag else None
        z = jnp.zeros((), dt)
        virial = (tally_virial(jnp.where(owned, fp, 0.0), dx)
                  if vflag else None)
        if self.coul:
            return f, (z if eflag else None), tot, virial
        return f, tot, (z if eflag else None), virial


def make_lepton(ntypes, coeffs, cut_global, coul=False, shift=False,
                qqr2e=0.0, dtype=jnp.float64):
    exprs, emap, cut = _dedupe(coeffs, ntypes, cut_global)
    eshift = np.zeros(len(exprs))
    fns = ({"zbl": __import__(
        "lammps_kokkos_port_tpu.utils.lepton", fromlist=["zbl_expr_fn"]
    ).zbl_expr_fn(qqr2e)} if qqr2e else None)
    if shift and not coul:
        for k, ex in enumerate(exprs):
            eshift[k] = float(lepton_fn(ex, fns=fns)(r=cut_global))
    return PairLepton(
        emap=jnp.asarray(emap), cutsq=jnp.asarray(cut * cut, dtype=dtype),
        eshift=jnp.asarray(eshift, dtype=dtype), exprs=exprs,
        ntypes=ntypes, cut_max=float(cut.max()), coul=coul, shift=shift,
        qqr2e=qqr2e)
