"""ForceField: the composition of all force contributions.

The analog of the reference's `Force` aggregate (ref: src/force.h — pair +
bond + angle + dihedral + improper + kspace style instances) plus the
special-bond weights (ref: force->special_lj/special_coul). One call
evaluates everything in a single fused XLA graph and returns force plus the
E_pair / E_mol split the thermo table reports (ref: src/thermo.cpp —
epair = pair + kspace; emol = bond + angle + dihedral + improper).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.state import State
from ..core.topology import SpecialBonds, Topology
from . import bonded as bonded_mod

Array = jax.Array

# sentinel list for category passes that do not touch the pair (bonded +
# kspace read only the state)
_EMPTY_NL = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pair", "bond", "angle", "dihedral", "improper", "kspace",
                 "topology", "special"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ForceField:
    pair: object | None = None
    bond: object | None = None
    angle: object | None = None
    dihedral: object | None = None
    improper: object | None = None
    kspace: object | None = None
    topology: Topology | None = None
    special: SpecialBonds | None = None

    def max_cutoff(self) -> float:
        cut = 0.0
        if self.pair is not None:
            cut = max(cut, self.pair.max_cutoff())
        if self.kspace is not None and hasattr(self.kspace, "real_cutoff"):
            cut = max(cut, self.kspace.real_cutoff())
        return cut

    ALL_CATS = ("pair", "bond", "angle", "dihedral", "improper", "kspace")

    def compute(self, state: State, nl, eflag: bool, vflag: bool):
        """Returns (f, epair, emol, virial6)."""
        return self.compute_categories(state, nl, self.ALL_CATS, eflag,
                                       vflag)

    def compute_categories(self, state: State, nl, cats, eflag: bool,
                           vflag: bool):
        """Evaluate only the listed force categories — the rRESPA level
        slicing hook (ref: src/respa.cpp level_bond/level_pair assignment;
        each level's force pass runs a subset of the styles)."""
        from ..ops import cellforce, gridforce, molcell, sortedforce, zwin

        if isinstance(nl, zwin.ZwinCells):
            f, pe, vir = zwin.compute(self.pair, state, nl, eflag, vflag)
            z = jnp.zeros((), dtype=state.dtype)
            return (f, pe if eflag else None,
                    z if eflag else None, vir)

        if isinstance(nl, molcell.MolCells):
            # dense molecular cell path: pair (with charges + special
            # masking) via ops/molcell; bonded + kspace as usual
            z = jnp.zeros((), dtype=state.dtype)
            f = jnp.zeros_like(state.x)
            epair = z if eflag else None
            emol = z if eflag else None
            virial = jnp.zeros(6, dtype=state.dtype) if vflag else None

            def acc(tot, val):
                return tot + val if val is not None and tot is not None \
                    else tot

            if "pair" in cats and self.pair is not None:
                pf, pv_, pc_, pvir = molcell.compute(
                    self.pair, state, nl, eflag, vflag,
                    special=self.special)
                f = f + pf
                epair = acc(acc(epair, pv_), pc_)
                virial = acc(virial, pvir)
            mol_cats = tuple(c for c in cats
                             if c not in ("pair",))
            if mol_cats:
                mf, me, mm, mv = self.compute_categories(
                    state, _EMPTY_NL, mol_cats, eflag, vflag)
                f = f + mf
                epair = acc(epair, me)
                emol = acc(emol, mm)
                virial = acc(virial, mv)
            return f, epair, emol, virial

        if isinstance(nl, (cellforce.CellListDense, gridforce.GridCells,
                           sortedforce.SortedCells)):
            # dense fast paths: pair-only force fields (see ops/cellforce,
            # ops/gridforce, ops/sortedforce; two-pass styles
            # like EAM take ops/eamdense)
            if getattr(self.pair, "is_granular", False):
                # granular styles own their dense dispatch (ops/grangrid
                # via compute_gran); energies are zero by definition
                f, pe, vir = self.pair.compute(state, nl, eflag, vflag)
                z = jnp.zeros((), dtype=state.dtype)
                return (f, pe if eflag else None,
                        z if eflag else None, vir)
            if getattr(self.pair, "dense_two_pass", False):
                from ..ops import eamdense

                ops = eamdense
            elif isinstance(nl, sortedforce.SortedCells):
                ops = sortedforce
            elif isinstance(nl, gridforce.GridCells):
                ops = gridforce
            else:
                ops = cellforce
            f, pe, vir = ops.compute(self.pair, state, nl, eflag, vflag)
            z = jnp.zeros((), dtype=state.dtype)
            return (f, pe if eflag else None,
                    z if eflag else None, vir)

        z = jnp.zeros((), dtype=state.dtype)
        f = jnp.zeros_like(state.x)
        epair = z if eflag else None
        emol = z if eflag else None
        virial = jnp.zeros(6, dtype=state.dtype) if vflag else None

        def acc(tot, val):
            return tot + val if val is not None and tot is not None else tot

        if "pair" in cats and self.pair is not None:
            slj = self.special.weights_lj if self.special is not None else None
            scoul = (self.special.weights_coul
                     if self.special is not None else None)
            try:
                pf, pe, pv = self.pair.compute(
                    state, nl, eflag, vflag, special_lj=slj, special_coul=scoul
                )
            except TypeError:
                # styles that ignore special weights (e.g. EAM)
                pf, pe, pv = self.pair.compute(state, nl, eflag, vflag)
            ps = state.aux.get("adapt_pair_scale")
            if ps is not None:
                pf = pf * ps
                pe = pe * ps if pe is not None else None
                pv = pv * ps if pv is not None else None
            f = f + pf
            epair = acc(epair, pe)
            virial = acc(virial, pv)

        top = self.topology
        if "bond" in cats and self.bond is not None and top is not None:
            # explicit-force styles (e.g. the RBC bond wlc_pow_all_visc,
            # non-conservative) provide compute() directly; conservative
            # styles go through the autodiff engine
            if hasattr(self.bond, "compute"):
                out = (self.bond.compute(state, top, eflag, vflag)
                       if top.bonds.shape[0] else None)
            else:
                out = bonded_mod.compute_bonds(
                    self.bond, state, top, eflag, vflag)
            if out is not None:
                bf, be, bv = out
                f = f + bf
                emol = acc(emol, be)
                virial = acc(virial, bv)
        if "angle" in cats and self.angle is not None and top is not None:
            if hasattr(self.angle, "compute"):
                out = (self.angle.compute(state, top, eflag, vflag)
                       if top.angles.shape[0] else None)
            else:
                out = bonded_mod.compute_angles(
                    self.angle, state, top, eflag, vflag)
            if out is not None:
                af, ae, av = out
                f = f + af
                emol = acc(emol, ae)
                virial = acc(virial, av)
        if "dihedral" in cats and self.dihedral is not None and top is not None:
            if hasattr(self.dihedral, "compute"):
                out = (self.dihedral.compute(state, top, eflag, vflag)
                       if top.dihedrals.shape[0] else None)
                out = out + (None,) if out is not None else None
            else:
                out = bonded_mod.compute_dihedrals(
                    self.dihedral, state, top, eflag, vflag,
                    which="dihedrals"
                )
            if out is not None:
                df, de, dv, extra14 = out
                f = f + df
                emol = acc(emol, de)
                virial = acc(virial, dv)
                if extra14 is not None:
                    # the CHARMM 1-4 pair term is PAIR energy/virial in the
                    # reference (dihedral_charmm.cpp:281 pair->ev_tally)
                    epair = acc(epair, extra14[0])
                    virial = acc(virial, extra14[1])
        if "improper" in cats and self.improper is not None and top is not None:
            out = bonded_mod.compute_dihedrals(
                self.improper, state, top, eflag, vflag, which="impropers"
            )
            if out is not None:
                if_, ie, iv, _ = out
                f = f + if_
                emol = acc(emol, ie)
                virial = acc(virial, iv)

        if "kspace" in cats and self.kspace is not None:
            kf, ke, kv = self.kspace.compute(state, eflag, vflag)
            ks = state.aux.get("adapt_kspace_scale")
            if ks is not None:
                kf = kf * ks
                ke = ke * ks if ke is not None else None
                kv = kv * ks if kv is not None else None
            f = f + kf
            epair = acc(epair, ke)
            virial = acc(virial, kv)

        return f, epair, emol, virial


def from_pair(pair) -> ForceField:
    return ForceField(pair=pair)
