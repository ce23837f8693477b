"""pair lj/cut/tip4p/cut and tip4p/cut: 4-point water electrostatics.

TPU-native equivalent of src/MOLECULE/pair_lj_cut_tip4p_cut.cpp. The TIP4P
charge of an O-type atom acts at the massless M site
    xM = xO + alpha/2 * ((xH1 - xO) + (xH2 - xO)),
    alpha = qdist / (cos(theta0/2) * blen0)          (ref: :507)
with theta0/blen0 the equilibrium angle/bond of the designated types.

Instead of the reference's hand-written lever-rule force redistribution
(fO = (1-alpha) fd, fH = alpha/2 fd, ref: :260-296), the energy is written
as a function of the REAL atom positions (M is a differentiable function
of O, H1, H2) and forces come from jax.grad — the analytic gradient IS
the redistribution, to roundoff. The virial comes from the strain
derivative dE/d(eps) (equal to the reference's per-pair tally with
distributed forces for this energy form).

Cutoffs follow the reference exactly: LJ on the real O/H distance,
coulomb on the M-M distance; neighbor inclusion uses
cut_coul + 2*qdist slack so displaced sites never miss a pair
(ref: cut_coulsqplus).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.custom_jvp
def _erfc_exactgrad(x):
    """The reference's A&S-polynomial erfc (pair_charmm.erfc_ref * e^-x^2)
    with the ANALYTIC derivative -2/sqrt(pi) e^-x^2 pinned as its JVP: the
    reference computes forces from that identity, not from the polynomial's
    own derivative, so autodiff must follow suit to match to roundoff."""
    from .pair_charmm import erfc_ref

    return erfc_ref(x) * jnp.exp(-x * x)


@_erfc_exactgrad.defjvp
def _erfc_exactgrad_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = _erfc_exactgrad(x)
    dydx = -2.0 / jnp.sqrt(jnp.pi) * jnp.exp(-x * x)
    return y, dydx * dx


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lj3", "lj4", "cut_ljsq_t", "qO_h1", "qO_h2"],
    meta_fields=["ntypes", "cut_lj", "cut_coul", "qdist", "alpha",
                 "typeO", "typeH", "lj_on", "coul_mode", "g_ewald"],
)
@dataclasses.dataclass(frozen=True)
class PairTIP4PCut:
    """lj/cut/tip4p/cut (lj_on=True) or tip4p/cut (coulomb only)."""

    lj3: Array  # 4*eps*sig^12 [nt+1, nt+1]
    lj4: Array  # 4*eps*sig^6
    cut_ljsq_t: Array  # [nt+1, nt+1] per-pair LJ cutoff^2
    qO_h1: Array  # [cap] int32: H1 row for O atoms (cap elsewhere)
    qO_h2: Array
    ntypes: int
    cut_lj: float
    cut_coul: float
    qdist: float
    alpha: float
    typeO: int
    typeH: int
    lj_on: bool = True
    coul_mode: str = "cut"  # "cut" | "long" (erfc-damped, kspace separate)
    g_ewald: float = 0.0

    def max_cutoff(self) -> float:
        base = self.cut_coul + 2.0 * self.qdist
        return max(self.cut_lj if self.lj_on else 0.0, base)

    def cutsq_table(self) -> Array:
        c = self.max_cutoff()
        nt = self.ntypes
        return jnp.full((nt + 1, nt + 1), c * c, dtype=self.lj3.dtype)

    # -- geometry -----------------------------------------------------------

    def _m_offsets(self, state) -> Array:
        """xM - x per atom (zero for non-O atoms)."""
        cap = state.capacity
        x = state.x
        h1 = jnp.minimum(self.qO_h1, cap - 1)
        h2 = jnp.minimum(self.qO_h2, cap - 1)
        d1 = state.box.min_image(x[h1] - x)
        d2 = state.box.min_image(x[h2] - x)
        is_o = (self.qO_h1 < cap)[:, None]
        return jnp.where(is_o, self.alpha * 0.5 * (d1 + d2), 0.0)

    # -- energy -------------------------------------------------------------

    def _energy_terms(self, x, state, nl, special_lj, special_coul,
                      strain=None):
        """(evdwl, ecoul) totals on a candidate position array. `strain`
        (3x3) applies d -> (I+strain) d to EVERY displacement (real pair
        vectors and M-site offsets) — the homogeneous deformation whose
        energy derivative is the virial."""
        st = state.replace(x=x)
        cap = state.capacity
        dt = x.dtype
        from .pair import gather_pairs

        j, jc, pair_valid, dxr, r2r = gather_pairs(st, nl)
        if strain is not None:
            dxr = dxr + dxr @ strain.T
            r2r = jnp.sum(dxr * dxr, axis=-1)

        if nl.sb is not None and special_lj is not None:
            flj = jnp.asarray(special_lj, dt)[nl.sb]
            fcoul = jnp.asarray(special_coul, dt)[nl.sb]
        else:
            flj = fcoul = None

        evdwl = jnp.zeros((), dt)
        if self.lj_on:
            ti = st.type[:, None]
            tj = st.type[jc]
            lj3 = self.lj3[ti, tj]
            lj4 = self.lj4[ti, tj]
            on = pair_valid & (r2r < self.cut_ljsq_t[ti, tj])
            r2s = jnp.where(on, r2r, 1.0)
            r6 = 1.0 / (r2s * r2s * r2s)
            e = r6 * (lj3 * r6 - lj4)
            if flj is not None:
                e = e * flj
            evdwl = 0.5 * jnp.sum(jnp.where(on, e, 0.0))

        # coulomb between charge sites
        off = self._m_offsets(st)
        if strain is not None:
            off = off + off @ strain.T
        dm = dxr + off[:, None, :] - off[jc]
        rm2 = jnp.sum(dm * dm, axis=-1)
        from .pair_charmm import _qqrd2e

        on = pair_valid & (rm2 < self.cut_coul ** 2)
        rm2s = jnp.where(on, rm2, 1.0)
        qiqj = st.q[:, None] * st.q[jc]
        if self.coul_mode == "long":
            r = jnp.sqrt(rm2s)
            prefactor = _qqrd2e(st) * qiqj / r
            ec = prefactor * _erfc_exactgrad(self.g_ewald * r)
            if fcoul is not None:
                ec = ec - (1.0 - fcoul) * prefactor
        else:
            qq = _qqrd2e(st) * qiqj
            ec = qq / jnp.sqrt(rm2s)
            if fcoul is not None:
                ec = ec * fcoul
        ecoul = 0.5 * jnp.sum(jnp.where(on, ec, 0.0))
        return evdwl, ecoul

    def compute_detailed(self, state, nl, eflag, vflag,
                         special_lj=None, special_coul=None):
        def etot(x):
            ev, ec = self._energy_terms(x, state, nl, special_lj,
                                        special_coul)
            return ev + ec

        f = -jax.grad(etot)(state.x)
        evdwl = ecoul = virial = None
        if eflag:
            evdwl, ecoul = self._energy_terms(state.x, state, nl,
                                              special_lj, special_coul)
        if vflag:
            # virial from the strain derivative: W_ab = -dE/d eps_ab with
            # x -> (I + eps) x (homogeneous deformation; exact for this
            # energy since min-image offsets scale with the box)
            dt = state.dtype

            def e_of_eps(eps6):
                eps = jnp.array(
                    [[eps6[0], eps6[3], eps6[4]],
                     [eps6[3], eps6[1], eps6[5]],
                     [eps6[4], eps6[5], eps6[2]]], dtype=dt)
                ev, ec = self._energy_terms(state.x, state, nl,
                                            special_lj, special_coul,
                                            strain=eps)
                return ev + ec

            g = jax.grad(e_of_eps)(jnp.zeros(6, dt))
            # off-diagonal eps entries appear twice in the symmetric strain
            virial = -g * jnp.asarray([1, 1, 1, 0.5, 0.5, 0.5], dt)
        return f, evdwl, ecoul, virial

    def compute(self, state, nl, eflag, vflag,
                special_lj=None, special_coul=None):
        f, ev, ec, vir = self.compute_detailed(state, nl, eflag, vflag,
                                               special_lj, special_coul)
        pe = (ev + ec) if eflag else None
        return f, pe, vir


def water_h_map(cap: int, bonds: np.ndarray, types: np.ndarray,
                typeO: int, typeH: int):
    """(h1, h2) [cap] int32 rows of the two H atoms bonded to each O-type
    atom (cap elsewhere). bonds: [NB, 3] (type, i, j) local 0-based."""
    h1 = np.full(cap, cap, dtype=np.int32)
    h2 = np.full(cap, cap, dtype=np.int32)
    for t, i, j in bonds:
        if t <= 0:
            continue
        for o, h in ((i, j), (j, i)):
            if types[o] == typeO and types[h] == typeH:
                if h1[o] == cap:
                    h1[o] = h
                elif h2[o] == cap and h1[o] != h:
                    h2[o] = h
    ok = (h1 < cap) & (h2 < cap)
    h1[~ok] = cap
    h2[~ok] = cap
    return h1, h2


def make_lj_cut_tip4p_cut(ntypes, coeffs, typeO, typeH, qdist,
                          blen, theta_deg, cut_lj, cut_coul=None,
                          bonds=None, types=None, cap=None,
                          mix="geometric", lj_on=True, coul_mode="cut",
                          g_ewald=0.0, dtype=jnp.float64):
    """Builder. coeffs: {(i, j): (eps, sigma[, cut])}; blen/theta_deg are
    the equilibrium bond length / angle of the designated typeB/typeA
    styles (ref: alpha = qdist / (cos(0.5 theta) blen))."""
    from .pair import mix_epsilon, mix_sigma

    cut_coul = cut_coul if cut_coul is not None else cut_lj
    nt = ntypes
    lj3 = np.zeros((nt + 1, nt + 1))
    lj4 = np.zeros((nt + 1, nt + 1))
    csq = np.zeros((nt + 1, nt + 1))
    eps_s = {}
    for (i, jt), c in coeffs.items():
        if len(c) < 2:
            continue  # "pair_coeff * *" with no values (pure tip4p/cut)
        eps_s[(i, jt)] = (c[0], c[1], c[2] if len(c) > 2 else cut_lj)
    for i in range(1, nt + 1):
        for jt in range(i, nt + 1):
            if (i, jt) in eps_s:
                e, s, c = eps_s[(i, jt)]
            elif (i, i) in eps_s and (jt, jt) in eps_s:
                e1, s1, _ = eps_s[(i, i)]
                e2, s2, _ = eps_s[(jt, jt)]
                e = mix_epsilon(e1, e2, s1, s2, mix)
                s = mix_sigma(s1, s2, mix)
                c = cut_lj
            else:
                continue
            lj3[i, jt] = lj3[jt, i] = 4.0 * e * s ** 12
            lj4[i, jt] = lj4[jt, i] = 4.0 * e * s ** 6
            csq[i, jt] = csq[jt, i] = c * c

    alpha = float(qdist / (np.cos(0.5 * np.deg2rad(theta_deg)) * blen))
    h1, h2 = water_h_map(cap, bonds, types, typeO, typeH)
    return PairTIP4PCut(
        lj3=jnp.asarray(lj3, dtype), lj4=jnp.asarray(lj4, dtype),
        cut_ljsq_t=jnp.asarray(csq, dtype),
        qO_h1=jnp.asarray(h1), qO_h2=jnp.asarray(h2),
        ntypes=nt, cut_lj=float(cut_lj), cut_coul=float(cut_coul),
        qdist=float(qdist), alpha=alpha, typeO=int(typeO),
        typeH=int(typeH), lj_on=lj_on, coul_mode=coul_mode,
        g_ewald=float(g_ewald))
