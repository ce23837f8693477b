"""Coulomb + CHARMM pair styles: lj/charmm/coul/long, lj/cut/coul/long,
lj/cut/coul/cut, coul/long, coul/cut, and pair zero.

TPU-native re-implementations of the reference styles
(ref: src/KSPACE/pair_lj_charmm_coul_long.cpp:87-330,
src/KSPACE/pair_lj_cut_coul_long.cpp, src/pair_lj_cut_coul_cut.cpp,
src/KSPACE/pair_coul_long.cpp, src/pair_coul_cut.cpp, src/pair_zero.cpp;
Kokkos twins in src/KOKKOS/). The real-space Ewald term uses the same
Abramowitz-Stegun erfc approximation and constants as the reference's
non-tabulated path, so fp64 results are bit-comparable to the golden
fixtures (which set `pair_modify table 0`).

Special-bond handling matches the reference: factor_lj scales the LJ term;
excluded coulomb pairs stay in the list and subtract
(1-factor_coul)*prefactor so the k-space part remains consistent
(ref: pair_lj_charmm_coul_long.cpp:147-160).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pair import gather_pairs, mix_epsilon, mix_sigma, tally_virial

Array = jax.Array

# ref: pair_lj_charmm_coul_long.cpp:37-43
EWALD_F = 1.12837917
EWALD_P = 0.3275911
A1 = 0.254829592
A2 = -0.284496736
A3 = 1.421413741
A4 = -1.453152027
A5 = 1.061405429


def erfc_ref(grij):
    """The reference's erfc approximation (A&S 7.1.26)."""
    t = 1.0 / (1.0 + EWALD_P * grij)
    return t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5))))


# CORESHELL constants (ref: src/CORESHELL/pair_coul_long_cs.cpp:27-38):
# note the cs styles use their OWN t-parameter EWALD_P_CS, not the base
# styles' 0.3275911
EWALD_P_CS = 9.95473818e-1
EPS_EWALD = 1.0e-6
EPS_EWALD_SQR = 1.0e-12
B0 = -0.1335096380159268
B1 = -2.57839507e-1
B2 = -1.37203639e-1
B3 = -8.88822059e-3
B4 = -5.80844129e-3
B5 = 1.14652755e-1


def erfc_cs(grij):
    """The CORESHELL styles' erfc approximation — the B-polynomial in
    u = 1-t with t = 1/(1+EWALD_P_CS*x) (ref: pair_coul_long_cs.cpp:28-34,
    116), NOT the base styles' A-form; the two differ at ~1e-7, which the
    cs fixtures' goldens bake in."""
    t = 1.0 / (1.0 + EWALD_P_CS * grij)
    u = 1.0 - t
    return t * (1.0 + u * (B0 + u * (B1 + u * (B2 + u * (B3 + u * (
        B4 + u * B5))))))


def coul_long_terms(r2, qiqj, qqrd2e, g_ewald, factor_coul, eflag,
                    cs=False):
    """Real-space Ewald coulomb: (forcecoul, ecoul), both premasked by the
    caller's cutoff. forcecoul is F*r (divide by r2 for fpair).

    `cs` selects the CORESHELL variant (ref: src/CORESHELL/
    pair_coul_long_cs.cpp:99-165): the B-form erfc for every pair, and
    special (factor_coul < 1) pairs evaluated at r + EPS_EWALD with the
    force divided by rsq + EPS_EWALD_SQR, so coincident core/shell
    charges (r = 0, interaction removed by the special subtraction) stay
    finite. The caller divides by rsq, so the modified division is folded
    in as a rsq/(rsq+EPS_EWALD_SQR) factor."""
    r = jnp.sqrt(r2)
    sp = None
    if cs and factor_coul is not None:
        sp = factor_coul < 1.0
        r = jnp.where(sp, r + EPS_EWALD, r)
    grij = g_ewald * r
    expm2 = jnp.exp(-grij * grij)
    erfc = (erfc_cs(grij) if cs else erfc_ref(grij)) * expm2
    prefactor = qqrd2e * qiqj / r
    forcecoul = prefactor * (erfc + EWALD_F * grij * expm2)
    ecoul = prefactor * erfc if eflag else None
    if factor_coul is not None:
        sub = (1.0 - factor_coul) * prefactor
        forcecoul = forcecoul - sub
        if sp is not None:
            forcecoul = jnp.where(
                sp, forcecoul * r2 / (r2 + EPS_EWALD_SQR), forcecoul)
        if eflag:
            ecoul = ecoul - sub
    return forcecoul, ecoul


def coul_cut_terms(r2, qiqj, qqrd2e, factor_coul, eflag):
    rinv = jax.lax.rsqrt(r2)
    fc = factor_coul if factor_coul is not None else 1.0
    forcecoul = qqrd2e * qiqj * rinv * fc
    ecoul = forcecoul if eflag else None  # e = qqrd2e qiqj / r * factor
    return forcecoul, ecoul


_CHARMM_FIELDS = ["lj1", "lj2", "lj3", "lj4", "lj14_1", "lj14_2", "lj14_3",
                  "lj14_4", "eps", "sigma"]
_CHARMM_META = ["ntypes", "cut_lj_inner", "cut_lj", "cut_coul", "g_ewald",
                "coul_mode", "lj_switch", "cut_coul_inner", "mix_kind",
                "cs"]


@partial(jax.tree_util.register_dataclass,
         data_fields=_CHARMM_FIELDS, meta_fields=_CHARMM_META)
@dataclasses.dataclass(frozen=True)
class PairLJCharmmCoulLong:
    """CHARMM LJ (inner/outer energy switching) + coulomb.

    coul_mode: 'long' (real-space Ewald erfc), 'cut', 'charmm' (CHARMM
    energy-switched plain coulomb, ref:
    src/MOLECULE/pair_lj_charmm_coul_charmm.cpp:120-131), or 'none'.
    lj_switch: True = CHARMM switching between inner/outer cutoffs
    (ref: pair_lj_charmm_coul_long.cpp denom_lj switch1/switch2 math);
    False = plain truncation at cut_lj (the lj/cut/coul/* family).
    """

    lj1: Array
    lj2: Array
    lj3: Array
    lj4: Array
    lj14_1: Array
    lj14_2: Array
    lj14_3: Array
    lj14_4: Array
    eps: Array
    sigma: Array
    ntypes: int
    cut_lj_inner: float
    cut_lj: float
    cut_coul: float
    g_ewald: float
    coul_mode: str
    lj_switch: bool
    cut_coul_inner: float = 0.0
    # nonempty ("arithmetic"/"geometric") when EVERY pair coefficient is
    # exactly the mix of the per-type diagonals: enables the packed
    # single-gather fast path (eps/sigma reconstructed per pair on the
    # VPU instead of 4 table gathers per pair per step — TPU gathers are
    # the molecular bottleneck, see bench rhodo notes)
    mix_kind: str = ""
    # CORESHELL coul/long/cs variant (see coul_long_terms)
    cs: bool = False

    def cutsq_table(self) -> Array:
        cut = max(self.cut_lj, self.cut_coul if self.coul_mode != "none" else 0.0)
        full = jnp.full_like(self.lj1, cut * cut)
        return full

    def max_cutoff(self) -> float:
        return max(self.cut_lj,
                   self.cut_coul if self.coul_mode != "none" else 0.0)

    def with_g_ewald(self, g: float) -> "PairLJCharmmCoulLong":
        return dataclasses.replace(self, g_ewald=float(g))

    def compute(self, state, nl, eflag: bool, vflag: bool,
                special_lj=None, special_coul=None):
        f, evdwl, ecoul, virial = self.compute_detailed(
            state, nl, eflag, vflag, special_lj, special_coul
        )
        pe = None
        if eflag:
            pe = evdwl + ecoul
        return f, pe, virial

    def compute_detailed(self, state, nl, eflag, vflag,
                         special_lj=None, special_coul=None):
        """Row-block evaluation via map_row_blocks: molecular K runs to
        ~1-2k, so the [cap, K] pair tensors are chunked to bound peak
        memory (bench/in.rhodo at 32k atoms needs this)."""
        cap = state.capacity
        dt = state.dtype
        qqrd2e = _qqrd2e(state)
        from .pair import map_row_blocks

        x_all = state.x
        t_all = state.type
        q_all = state.q
        K = nl.idx.shape[1]
        if nl.shift is not None:
            from ..ops.neighbor import shift_offsets

            offs = jnp.asarray(shift_offsets(nl.params.images), dtype=dt)
            vecs = offs @ state.box.h.T
        else:
            vecs = None

        ti_rows_in = None if self.ntypes == 1 else state.type
        q_rows_in = None if state.q is None else state.q

        packed = None
        if (self.mix_kind and self.ntypes > 1 and state.q is not None
                and nl.shift is None):
            # pack every per-atom quantity the kernel reads into ONE
            # 8-lane row: a single [B, K, 8] gather replaces the x/q/
            # eps/sigma (and 4 lj-table) gathers
            epsd = jnp.sqrt(jnp.diagonal(self.eps))[state.type]
            sigd = jnp.diagonal(self.sigma)[state.type]
            zeros = jnp.zeros_like(sigd)
            packed = jnp.stack(
                [x_all[:, 0], x_all[:, 1], x_all[:, 2], q_all,
                 epsd, sigd, zeros, zeros], axis=1)

        def block(xi_rows, ti_rows, qi_rows, owned_rows, j_rows, sb_rows,
                  sh_rows, pk_rows):
            if packed is not None:
                return self._block_packed(
                    state, pk_rows, owned_rows, j_rows, sb_rows, packed,
                    qqrd2e, eflag, vflag, special_lj, special_coul)
            return self._block(
                state, xi_rows, ti_rows, qi_rows, owned_rows, j_rows,
                sb_rows, sh_rows, x_all, t_all, q_all, vecs, qqrd2e,
                eflag, vflag, special_lj, special_coul)

        f, evdwl, ecoul, virial = map_row_blocks(
            cap, K, block,
            [state.x, ti_rows_in, q_rows_in, state.owned_mask,
             nl.idx, nl.sb, nl.shift, packed],
            concat_outs=1)
        return f, evdwl, ecoul, virial

    # -- packed protocol for the dense molecular cell engine ---------------
    # (ops/molcell: one [cap, 8] per-atom payload gathered once per step)

    def make_packed(self, state):
        """[cap, 8]: x, y, z, q, sqrt(eps_type), sigma_type, 0, 0 — valid
        only when mix_kind is set (every coeff is the diagonal mix)."""
        epsd = jnp.sqrt(jnp.diagonal(self.eps))[state.type]
        sigd = jnp.diagonal(self.sigma)[state.type]
        q = state.q if state.q is not None else jnp.zeros_like(sigd)
        z = jnp.zeros_like(sigd)
        return jnp.stack([state.x[:, 0], state.x[:, 1], state.x[:, 2],
                          q, epsd, sigd, z, z], axis=1)

    def packed_pair_terms(self, r2s, pki, pkj, flj, fcoul, qqrd2e, eflag):
        """(fpair=F/r, evdwl, ecoul) from packed payloads, cutoffs applied.
        pki [.., 1, 8] broadcastable against pkj [.., C, 8]."""
        dt = r2s.dtype
        if pki.ndim == pkj.ndim:  # [B, cc, L] own vs [B, Scc, L] cand
            pki = pki[:, :, None, :]
            pkj = pkj[:, None, :, :]
        seps = pki[..., 4] * pkj[..., 4]
        if self.mix_kind == "geometric":
            sij = jnp.sqrt(pki[..., 5] * pkj[..., 5])
        else:
            sij = 0.5 * (pki[..., 5] + pkj[..., 5])
        s2 = sij * sij
        s6 = s2 * s2 * s2
        lj2 = 24.0 * seps * s6
        lj1 = 2.0 * lj2 * s6
        lj4 = lj2 / 6.0
        lj3 = lj1 / 12.0

        cut_ljsq = self.cut_lj * self.cut_lj
        cut_coulsq = self.cut_coul * self.cut_coul
        r2inv = 1.0 / r2s
        r6inv = r2inv * r2inv * r2inv
        forcelj = r6inv * (lj1 * r6inv - lj2)
        philj = r6inv * (lj3 * r6inv - lj4)
        if self.lj_switch:
            inner_sq = self.cut_lj_inner * self.cut_lj_inner
            denom_lj = (cut_ljsq - inner_sq) ** 3
            sw1 = ((cut_ljsq - r2s) ** 2
                   * (cut_ljsq + 2.0 * r2s - 3.0 * inner_sq) / denom_lj)
            sw2 = (12.0 * r2s * (cut_ljsq - r2s) * (r2s - inner_sq)
                   / denom_lj)
            in_sw = r2s > inner_sq
            forcelj = jnp.where(in_sw, forcelj * sw1 + philj * sw2,
                                forcelj)
            philj = jnp.where(in_sw, philj * sw1, philj)
        lj_on = r2s < cut_ljsq
        if flj is not None:
            forcelj = forcelj * flj
            philj = philj * flj
        forcelj = jnp.where(lj_on, forcelj, 0.0)

        if self.coul_mode != "none":
            qiqj = pki[..., 3] * pkj[..., 3]
            if self.coul_mode == "long":
                forcecoul, ec = coul_long_terms(
                    r2s, qiqj, qqrd2e, self.g_ewald, fcoul, True,
                    cs=self.cs)
            elif self.coul_mode == "charmm":
                pref = qqrd2e * qiqj * jnp.sqrt(r2inv)
                in_sq = self.cut_coul_inner * self.cut_coul_inner
                denom_coul = (cut_coulsq - in_sq) ** 3
                sw1c = ((cut_coulsq - r2s) ** 2
                        * (cut_coulsq + 2.0 * r2s - 3.0 * in_sq)
                        / denom_coul)
                pref = jnp.where(r2s > in_sq, pref * sw1c, pref)
                fc = fcoul if fcoul is not None else 1.0
                forcecoul = pref * fc
                ec = forcecoul
            else:
                forcecoul, ec = coul_cut_terms(r2s, qiqj, qqrd2e, fcoul,
                                               True)
            coul_on = r2s < cut_coulsq
            forcecoul = jnp.where(coul_on, forcecoul, 0.0)
            ec = jnp.where(coul_on, ec, 0.0)
        else:
            forcecoul = jnp.zeros_like(r2s)
            ec = jnp.zeros_like(r2s)
        philj = jnp.where(lj_on, philj, 0.0)
        fpair = (forcecoul + forcelj) * r2inv
        return fpair, philj, ec

    def _block_packed(self, state, pk_rows, owned_rows, j_rows, sb_rows,
                      packed, qqrd2e, eflag, vflag, special_lj,
                      special_coul):
        """Single-gather row block: per-pair eps/sigma from the mixing
        rule on the VPU (valid only when mix_kind is set — every coeff is
        the mix of the diagonals). Physics identical to _block."""
        cap = state.capacity
        dt = state.dtype
        jc = jnp.clip(j_rows, 0, cap - 1)
        pair_valid = j_rows < cap
        pj = packed[jc]                       # the ONE gather [B, K, 8]
        xi = pk_rows[:, None, :3]
        xj = pj[..., :3]
        dx = state.box.min_image(xi - xj)
        r2 = jnp.sum(dx * dx, axis=-1)

        seps = pk_rows[:, None, 4] * pj[..., 4]     # sqrt(ei)*sqrt(ej)
        if self.mix_kind == "geometric":
            sij = jnp.sqrt(pk_rows[:, None, 5] * pj[..., 5])
        else:
            sij = 0.5 * (pk_rows[:, None, 5] + pj[..., 5])
        s2 = sij * sij
        s6 = s2 * s2 * s2
        lj2 = 24.0 * seps * s6
        lj1 = 2.0 * lj2 * s6        # 48 eps s12
        lj4 = lj2 / 6.0             # 4 eps s6
        lj3 = lj1 / 12.0            # 4 eps s12

        cut_ljsq = self.cut_lj * self.cut_lj
        cut_coulsq = self.cut_coul * self.cut_coul
        cut_bothsq = max(cut_ljsq,
                         cut_coulsq if self.coul_mode != "none" else 0.0)
        valid = pair_valid & (r2 < cut_bothsq)
        r2s = jnp.where(valid, r2, jnp.ones((), dt))
        r2inv = 1.0 / r2s

        # special factors as select chains (a 4-entry table gather per
        # pair would cost as much as the big gather)
        def sel(ws):
            w = jnp.asarray(ws, dt)
            out = jnp.full(sb_rows.shape, w[0], dt)
            for k in (1, 2, 3):
                out = jnp.where(sb_rows == k, w[k], out)
            return out

        flj = sel(special_lj) if (sb_rows is not None
                                  and special_lj is not None) else None
        fcoul = sel(special_coul) if (sb_rows is not None
                                      and special_coul is not None) else None

        r6inv = r2inv * r2inv * r2inv
        forcelj = r6inv * (lj1 * r6inv - lj2)
        philj = r6inv * (lj3 * r6inv - lj4)
        if self.lj_switch:
            inner_sq = self.cut_lj_inner * self.cut_lj_inner
            denom_lj = (cut_ljsq - inner_sq) ** 3
            switch1 = ((cut_ljsq - r2s) ** 2
                       * (cut_ljsq + 2.0 * r2s - 3.0 * inner_sq) / denom_lj)
            switch2 = (12.0 * r2s * (cut_ljsq - r2s) * (r2s - inner_sq)
                       / denom_lj)
            in_switch = r2s > inner_sq
            forcelj = jnp.where(
                in_switch, forcelj * switch1 + philj * switch2, forcelj)
            if eflag:
                philj = jnp.where(in_switch, philj * switch1, philj)
        lj_on = valid & (r2 < cut_ljsq)
        if flj is not None:
            forcelj = forcelj * flj
            philj = philj * flj
        forcelj = jnp.where(lj_on, forcelj, 0.0)

        if self.coul_mode != "none":
            qiqj = pk_rows[:, None, 3] * pj[..., 3]
            if self.coul_mode == "long":
                forcecoul, ec = coul_long_terms(
                    r2s, qiqj, qqrd2e, self.g_ewald, fcoul, eflag,
                    cs=self.cs)
            elif self.coul_mode == "charmm":
                pref = qqrd2e * qiqj * jnp.sqrt(r2inv)
                in_sq = self.cut_coul_inner * self.cut_coul_inner
                denom_coul = (cut_coulsq - in_sq) ** 3
                sw1 = ((cut_coulsq - r2s) ** 2
                       * (cut_coulsq + 2.0 * r2s - 3.0 * in_sq)
                       / denom_coul)
                pref = jnp.where(r2s > in_sq, pref * sw1, pref)
                fc = fcoul if fcoul is not None else 1.0
                forcecoul = pref * fc
                ec = forcecoul if eflag else None
            else:
                forcecoul, ec = coul_cut_terms(r2s, qiqj, qqrd2e, fcoul,
                                               eflag)
            coul_on = valid & (r2 < cut_coulsq)
            forcecoul = jnp.where(coul_on, forcecoul, 0.0)
        else:
            forcecoul = jnp.zeros_like(r2s)
            ec = jnp.zeros_like(r2s) if eflag else None
            coul_on = jnp.zeros_like(valid)

        fpair = (forcecoul + forcelj) * r2inv
        fpair = jnp.where(valid, fpair, 0.0)
        f = jnp.sum(dx * fpair[..., None], axis=1)

        owned = owned_rows[:, None]
        evdwl = ecoul = None
        if eflag:
            evdwl = 0.5 * jnp.sum(jnp.where(lj_on & owned, philj, 0.0))
            ecoul = 0.5 * jnp.sum(jnp.where(coul_on & owned, ec, 0.0))

        virial = (tally_virial(jnp.where(owned, fpair, 0.0), dx)
                  if vflag else None)
        return f, evdwl, ecoul, virial

    def _block(self, state, xi_rows, ti_rows, qi_rows, owned_rows, j_rows,
               sb_rows, sh_rows, x_all, t_all, q_all, vecs, qqrd2e,
               eflag, vflag, special_lj, special_coul):
        cap = state.capacity
        dt = state.dtype
        jc = jnp.clip(j_rows, 0, cap - 1)
        pair_valid = j_rows < cap
        xi = xi_rows[:, None, :]
        xj = x_all[jc]
        if sh_rows is not None:
            dx = xi - (xj + vecs[sh_rows])
        else:
            dx = state.box.min_image(xi - xj)
        r2 = jnp.sum(dx * dx, axis=-1)

        if self.ntypes == 1:
            ti = tj = None
            lj1, lj2 = self.lj1[1, 1], self.lj2[1, 1]
            lj3, lj4 = self.lj3[1, 1], self.lj4[1, 1]
        else:
            ti = ti_rows[:, None]
            tj = t_all[jc]
            lj1, lj2 = self.lj1[ti, tj], self.lj2[ti, tj]
            lj3, lj4 = self.lj3[ti, tj], self.lj4[ti, tj]

        cut_ljsq = self.cut_lj * self.cut_lj
        cut_coulsq = self.cut_coul * self.cut_coul
        cut_bothsq = max(cut_ljsq,
                         cut_coulsq if self.coul_mode != "none" else 0.0)

        valid = pair_valid & (r2 < cut_bothsq)
        r2s = jnp.where(valid, r2, jnp.ones((), dt))
        r2inv = 1.0 / r2s

        # special factors per pair
        if sb_rows is not None and special_lj is not None:
            flj = jnp.asarray(special_lj, dt)[sb_rows]
        else:
            flj = None
        if sb_rows is not None and special_coul is not None:
            fcoul = jnp.asarray(special_coul, dt)[sb_rows]
        else:
            fcoul = None

        # ---- LJ part ----
        r6inv = r2inv * r2inv * r2inv
        forcelj = r6inv * (lj1 * r6inv - lj2)
        philj = r6inv * (lj3 * r6inv - lj4)
        if self.lj_switch:
            inner_sq = self.cut_lj_inner * self.cut_lj_inner
            denom_lj = (cut_ljsq - inner_sq) ** 3
            switch1 = ((cut_ljsq - r2s) ** 2
                       * (cut_ljsq + 2.0 * r2s - 3.0 * inner_sq) / denom_lj)
            switch2 = (12.0 * r2s * (cut_ljsq - r2s) * (r2s - inner_sq)
                       / denom_lj)
            in_switch = r2s > inner_sq
            forcelj = jnp.where(
                in_switch, forcelj * switch1 + philj * switch2, forcelj
            )
            if eflag:
                philj = jnp.where(in_switch, philj * switch1, philj)
        lj_on = valid & (r2 < cut_ljsq)
        if flj is not None:
            forcelj = forcelj * flj
            philj = philj * flj
        forcelj = jnp.where(lj_on, forcelj, 0.0)

        # ---- Coulomb part ----
        if self.coul_mode != "none" and qi_rows is not None:
            qi = qi_rows[:, None]
            qj = q_all[jc]
            qiqj = qi * qj
            if self.coul_mode == "long":
                forcecoul, ec = coul_long_terms(
                    r2s, qiqj, qqrd2e, self.g_ewald, fcoul, eflag,
                    cs=self.cs
                )
            elif self.coul_mode == "charmm":
                # CHARMM energy-switched plain coulomb: FORCE is scaled by
                # the same switch (not energy-consistent, by reference
                # design — pair_lj_charmm_coul_charmm.cpp:123-131)
                pref = qqrd2e * qiqj * jnp.sqrt(r2inv)
                in_sq = self.cut_coul_inner * self.cut_coul_inner
                denom_coul = (cut_coulsq - in_sq) ** 3
                sw1 = ((cut_coulsq - r2s) ** 2
                       * (cut_coulsq + 2.0 * r2s - 3.0 * in_sq) / denom_coul)
                pref = jnp.where(r2s > in_sq, pref * sw1, pref)
                fc = fcoul if fcoul is not None else 1.0
                forcecoul = pref * fc
                ec = forcecoul if eflag else None
            else:
                forcecoul, ec = coul_cut_terms(r2s, qiqj, qqrd2e, fcoul, eflag)
            coul_on = valid & (r2 < cut_coulsq)
            forcecoul = jnp.where(coul_on, forcecoul, 0.0)
        else:
            forcecoul = jnp.zeros_like(r2s)
            ec = jnp.zeros_like(r2s) if eflag else None
            coul_on = jnp.zeros_like(valid)

        fpair = (forcecoul + forcelj) * r2inv
        fpair = jnp.where(valid, fpair, 0.0)
        f = jnp.sum(dx * fpair[..., None], axis=1)

        owned = owned_rows[:, None]
        evdwl = ecoul = None
        if eflag:
            evdwl = 0.5 * jnp.sum(jnp.where(lj_on & owned, philj, 0.0))
            ecoul = 0.5 * jnp.sum(jnp.where(coul_on & owned, ec, 0.0))

        virial = (tally_virial(jnp.where(owned, fpair, 0.0), dx)
                  if vflag else None)
        return f, evdwl, ecoul, virial


def _qqrd2e(state):
    from ..utils.units import get_units

    return get_units(state.units_name).qqr2e


def _build_lj_tables(ntypes, coeffs, mix, lj14=False):
    eps = np.zeros((ntypes + 1, ntypes + 1))
    sig = np.zeros((ntypes + 1, ntypes + 1))
    eps14 = np.zeros((ntypes + 1, ntypes + 1))
    sig14 = np.zeros((ntypes + 1, ntypes + 1))
    setflag = np.zeros((ntypes + 1, ntypes + 1), dtype=bool)
    for (i, jt), c in coeffs.items():
        i, jt = min(i, jt), max(i, jt)
        eps[i, jt] = c[0]
        sig[i, jt] = c[1]
        eps14[i, jt] = c[2] if len(c) > 2 else c[0]
        sig14[i, jt] = c[3] if len(c) > 3 else c[1]
        setflag[i, jt] = True
    for i in range(1, ntypes + 1):
        if not setflag[i, i]:
            raise ValueError(f"pair coeff ({i},{i}) not set")
    for i in range(1, ntypes + 1):
        for jt in range(1, ntypes + 1):
            lo, hi = min(i, jt), max(i, jt)
            if not setflag[lo, hi]:
                eps[lo, hi] = mix_epsilon(eps[lo, lo], eps[hi, hi],
                                          sig[lo, lo], sig[hi, hi], mix)
                sig[lo, hi] = mix_sigma(sig[lo, lo], sig[hi, hi], mix)
                eps14[lo, hi] = mix_epsilon(eps14[lo, lo], eps14[hi, hi],
                                            sig14[lo, lo], sig14[hi, hi], mix)
                sig14[lo, hi] = mix_sigma(sig14[lo, lo], sig14[hi, hi], mix)
    # symmetrize
    for a in (eps, sig, eps14, sig14):
        for i in range(1, ntypes + 1):
            for jt in range(i + 1, ntypes + 1):
                a[jt, i] = a[i, jt]
    return eps, sig, eps14, sig14


def _factorable_mix(eps, sig, ntypes, mix) -> str:
    """mix kind when every off-diagonal coeff equals the mix of the
    diagonals (bit-exact in the sqrt(ei)*sqrt(ej) factorization) — the
    packed fast path reconstructs eps/sigma per pair from per-atom values.
    Note sqrt(ei*ej) != sqrt(ei)*sqrt(ej) in fp; require agreement to 1
    ulp-ish and recompute the diagonal contribution the same way."""
    if mix not in ("arithmetic", "geometric"):
        return ""
    se = np.sqrt(eps)
    for i in range(1, ntypes + 1):
        for j in range(1, ntypes + 1):
            e_mix = se[i, i] * se[j, j]
            s_mix = (np.sqrt(sig[i, i] * sig[j, j]) if mix == "geometric"
                     else 0.5 * (sig[i, i] + sig[j, j]))
            if not (np.isclose(eps[i, j], e_mix, rtol=1e-15, atol=0.0)
                    and np.isclose(sig[i, j], s_mix, rtol=1e-15, atol=0.0)):
                return ""
    return mix


def make_lj_charmm_coul_long(
    ntypes: int,
    coeffs: dict,
    cut_lj_inner: float,
    cut_lj: float,
    cut_coul: float | None = None,
    g_ewald: float = 0.0,
    coul_mode: str = "long",
    mix: str = "arithmetic",
    dtype=jnp.float64,
) -> PairLJCharmmCoulLong:
    """pair_style lj/charmm/coul/long inner outer [cut_coul]
    (CHARMM default mixing is arithmetic, ref: pair init)."""
    eps, sig, eps14, sig14 = _build_lj_tables(ntypes, coeffs, mix)
    if cut_coul is None:
        cut_coul = cut_lj

    def tables(e, s):
        return (
            48.0 * e * s**12, 24.0 * e * s**6,
            4.0 * e * s**12, 4.0 * e * s**6,
        )

    lj1, lj2, lj3, lj4 = tables(eps, sig)
    l141, l142, l143, l144 = tables(eps14, sig14)
    asx = lambda a: jnp.asarray(a, dtype=dtype)
    return PairLJCharmmCoulLong(
        lj1=asx(lj1), lj2=asx(lj2), lj3=asx(lj3), lj4=asx(lj4),
        lj14_1=asx(l141), lj14_2=asx(l142), lj14_3=asx(l143), lj14_4=asx(l144),
        eps=asx(eps), sigma=asx(sig),
        ntypes=ntypes, cut_lj_inner=float(cut_lj_inner), cut_lj=float(cut_lj),
        cut_coul=float(cut_coul), g_ewald=float(g_ewald),
        coul_mode=coul_mode, lj_switch=True,
        mix_kind=_factorable_mix(eps, sig, ntypes, mix),
    )


def make_lj_charmm_coul_charmm(
    ntypes: int,
    coeffs: dict,
    cut_lj_inner: float,
    cut_lj: float,
    cut_coul_inner: float | None = None,
    cut_coul: float | None = None,
    mix: str = "arithmetic",
    dtype=jnp.float64,
) -> PairLJCharmmCoulLong:
    """pair_style lj/charmm/coul/charmm inner outer [coul_inner coul_outer]
    (ref: src/MOLECULE/pair_lj_charmm_coul_charmm.cpp settings())."""
    style = make_lj_charmm_coul_long(
        ntypes, coeffs, cut_lj_inner, cut_lj,
        cut_coul if cut_coul is not None else cut_lj,
        coul_mode="charmm", mix=mix, dtype=dtype,
    )
    return dataclasses.replace(
        style,
        cut_coul_inner=float(cut_coul_inner if cut_coul_inner is not None
                             else cut_lj_inner),
    )


def make_lj_cut_coul(
    ntypes: int,
    coeffs: dict,
    cut_lj: float,
    cut_coul: float | None = None,
    g_ewald: float = 0.0,
    coul_mode: str = "long",
    mix: str = "geometric",
    dtype=jnp.float64,
) -> PairLJCharmmCoulLong:
    """pair_style lj/cut/coul/long | lj/cut/coul/cut (plain LJ truncation)."""
    style = make_lj_charmm_coul_long(
        ntypes, coeffs, cut_lj, cut_lj, cut_coul, g_ewald, coul_mode,
        mix=mix, dtype=dtype,
    )
    return dataclasses.replace(style, lj_switch=False)


@partial(jax.tree_util.register_dataclass,
         data_fields=["cutsq"], meta_fields=["ntypes", "cut_coul", "g_ewald",
                                             "coul_mode", "cs"])
@dataclasses.dataclass(frozen=True)
class PairCoul:
    """pair_style coul/long or coul/cut (no LJ)
    (ref: src/KSPACE/pair_coul_long.cpp, src/pair_coul_cut.cpp).
    coul/cut supports per-type-pair cutoffs mixed like distances
    (ref: pair_coul_cut.cpp init_one)."""

    cutsq: Array  # [ntypes+1, ntypes+1]
    ntypes: int
    cut_coul: float
    g_ewald: float = 0.0
    coul_mode: str = "long"
    cs: bool = False  # CORESHELL coul/long/cs (see coul_long_terms)

    @staticmethod
    def create(ntypes, cut_coul, coeffs=None, g_ewald=0.0, coul_mode="long",
               mix="geometric", dtype=jnp.float64):
        cut = np.full((ntypes + 1, ntypes + 1), float(cut_coul))
        setflag = np.zeros((ntypes + 1, ntypes + 1), dtype=bool)
        if coeffs:
            for (i, jt), c in coeffs.items():
                lo, hi = min(i, jt), max(i, jt)
                if len(c) > 0:
                    cut[lo, hi] = c[0]
                setflag[lo, hi] = True
        for i in range(1, ntypes + 1):
            for jt in range(i + 1, ntypes + 1):
                if not setflag[i, jt]:
                    cut[i, jt] = mix_sigma(cut[i, i], cut[jt, jt], mix)
        for i in range(1, ntypes + 1):
            for jt in range(i + 1, ntypes + 1):
                cut[jt, i] = cut[i, jt]
        return PairCoul(
            cutsq=jnp.asarray(cut * cut, dtype=dtype), ntypes=ntypes,
            cut_coul=float(np.max(cut[1:, 1:])), g_ewald=float(g_ewald),
            coul_mode=coul_mode,
        )

    def cutsq_table(self) -> Array:
        return self.cutsq

    def max_cutoff(self) -> float:
        return self.cut_coul

    def with_g_ewald(self, g: float) -> "PairCoul":
        return dataclasses.replace(self, g_ewald=float(g))

    def compute(self, state, nl, eflag, vflag, special_lj=None,
                special_coul=None):
        f, evdwl, ecoul, virial = self.compute_detailed(
            state, nl, eflag, vflag, special_lj, special_coul
        )
        return f, (evdwl + ecoul if eflag else None), virial

    def compute_detailed(self, state, nl, eflag, vflag,
                         special_lj=None, special_coul=None):
        j, jc, pair_valid, dx, r2 = gather_pairs(state, nl)
        dt = state.dtype
        qqrd2e = _qqrd2e(state)
        if self.ntypes == 1:
            cutsq = self.cutsq[1, 1]
        else:
            cutsq = self.cutsq[state.type[:, None], state.type[jc]]
        valid = pair_valid & (r2 < cutsq)
        r2s = jnp.where(valid, r2, jnp.ones((), dt))
        if nl.sb is not None and special_coul is not None:
            fcoul = jnp.asarray(special_coul, dt)[nl.sb]
        else:
            fcoul = None
        qi = state.q[:, None]
        qj = state.q[jc]
        if self.coul_mode == "long":
            forcecoul, ec = coul_long_terms(
                r2s, qi * qj, qqrd2e, self.g_ewald, fcoul, eflag,
                cs=self.cs
            )
        else:
            forcecoul, ec = coul_cut_terms(r2s, qi * qj, qqrd2e, fcoul, eflag)
        fpair = jnp.where(valid, forcecoul / r2s, 0.0)
        f = jnp.sum(dx * fpair[..., None], axis=1)
        owned = state.owned_mask[:, None]
        ecoul = (0.5 * jnp.sum(jnp.where(valid & owned, ec, 0.0))
                 if eflag else None)
        evdwl = jnp.zeros((), dt) if eflag else None
        virial = (tally_virial(jnp.where(owned, fpair, 0.0), dx)
                  if vflag else None)
        return f, evdwl, ecoul, virial


@partial(jax.tree_util.register_dataclass,
         data_fields=[], meta_fields=["ntypes", "cut"])
@dataclasses.dataclass(frozen=True)
class PairZero:
    """pair_style zero: no interactions, only a neighbor cutoff
    (ref: src/pair_zero.cpp — used by the bonded-style fixtures)."""

    ntypes: int
    cut: float

    def cutsq_table(self) -> Array:
        return jnp.full((self.ntypes + 1, self.ntypes + 1), self.cut * self.cut)

    def max_cutoff(self) -> float:
        return self.cut

    def compute(self, state, nl, eflag, vflag, special_lj=None,
                special_coul=None):
        z = jnp.zeros((), state.dtype)
        return (
            jnp.zeros_like(state.x),
            z if eflag else None,
            jnp.zeros(6, state.dtype) if vflag else None,
        )
