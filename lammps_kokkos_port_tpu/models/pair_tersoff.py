"""Pair style tersoff: 3-body bond-order potential.

TPU-native re-design of the reference Tersoff
(ref: src/MANYBODY/pair_tersoff.cpp:112-380 compute/zeta/ters_*, read_file
field order :56-74; Kokkos twin src/KOKKOS/pair_tersoff_kokkos.cpp). The
reference hand-derives the 3-body chain rule (attractive/zeta terms into
i, j, and every k); here the total energy is ONE closed-form expression
over the padded neighbor matrix —

    E = sum_i sum_j 0.5 fc(r_ij) [ A e^{-l1 r_ij} - b_ij B e^{-l2 r_ij} ]
    b_ij = (1 + (beta zeta_ij)^n)^{-1/(2n)},
    zeta_ij = sum_k fc(r_ik) g(cos theta_ijk) e^{l3^m (r_ij - r_ik)^m}

— and forces are jax.grad of it (exact; the expression is smooth inside
the cutoff shell). The virial comes from the strain derivative
(dE/d eps), correct for many-body PBC interactions. The zeta pairwise
angle table is [N, K, K] over the neighbor matrix, batched for the VPU.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_FIELDS = ["m", "gamma", "lam3", "c", "d", "h", "n", "beta", "lam2", "bigb",
           "bigr", "bigd", "lam1", "biga"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=_FIELDS,
    meta_fields=["ntypes", "cutmax", "m_is_3"],
)
@dataclasses.dataclass(frozen=True)
class PairTersoff:
    """Parameter tables [nt+1, nt+1, nt+1] indexed (type_i, type_j, type_k);
    2-body entries read the (i, j, j) diagonal."""

    m: Array
    gamma: Array
    lam3: Array
    c: Array
    d: Array
    h: Array
    n: Array
    beta: Array
    lam2: Array
    bigb: Array
    bigr: Array
    bigd: Array
    lam1: Array
    biga: Array
    ntypes: int
    cutmax: float
    m_is_3: bool  # all powerm == 3 (the common case; else powerm == 1)

    def cutsq_table(self) -> Array:
        return jnp.full((self.ntypes + 1, self.ntypes + 1),
                        self.cutmax * self.cutmax)

    def max_cutoff(self) -> float:
        return self.cutmax

    # -- energy --------------------------------------------------------------

    @staticmethod
    def _fc(r, R, D):
        """Cutoff smoothing (ref: ters_fc): 1 below R-D, cos-ramp to 0."""
        t = jnp.clip((r - R) / D, -1.0, 1.0)
        return jnp.where(
            r < R - D, 1.0,
            jnp.where(r > R + D, 0.0, 0.5 * (1.0 - jnp.sin(0.5 * jnp.pi * t)))
        )

    def _energy_from_disp(self, dxj, mask_j, ti, tj):
        """Total energy from neighbor displacement vectors.

        dxj: [N, K, 3] displacement x_i - x_j; mask_j: [N, K] valid;
        ti: [N] types; tj: [N, K] neighbor types.
        """
        eps_r = 1e-12
        r2 = jnp.sum(dxj * dxj, axis=-1)
        r = jnp.sqrt(jnp.where(mask_j, r2, 1.0))

        single = self.ntypes == 1

        def p2(tab):  # (i, j, j) 2-body parameter per pair [N, K]
            if single:
                return tab[1, 1, 1]
            return tab[ti[:, None], tj, tj]

        R2b, D2b = p2(self.bigr), p2(self.bigd)
        # pairs beyond the force cutoff live in the list (skin shell) but
        # contribute nothing (fc = 0); cap their r inside the zeta/bond-order
        # math so exp((lam3 dr)^3) cannot overflow and poison gradients
        # through the masked branches (the classic where-NaN pitfall)
        in_j = mask_j & (r < R2b + D2b)
        r_z = jnp.where(in_j, r, R2b + D2b)
        fc_ij = jnp.where(in_j, self._fc(r, R2b, D2b), 0.0)

        # repulsive
        e_rep = fc_ij * p2(self.biga) * jnp.exp(-p2(self.lam1) * r)

        # zeta over triplets: [N, K(j), K(k)]
        def p3(tab):  # (i, j, k) parameter [N, K, K]
            if single:
                return tab[1, 1, 1]
            return tab[ti[:, None, None], tj[:, :, None], tj[:, None, :]]

        rij = r_z[:, :, None]  # [N, K, 1] (capped at the force cutoff)
        rik = r[:, None, :]  # [N, 1, K]
        cos_t = jnp.sum(dxj[:, :, None, :] * dxj[:, None, :, :], axis=-1) / (
            rij * rik
        )
        gamma, c, d, h = p3(self.gamma), p3(self.c), p3(self.d), p3(self.h)
        c2 = c * c
        d2 = d * d
        g = gamma * (1.0 + c2 / d2 - c2 / (d2 + (h - cos_t) ** 2))
        lam3 = p3(self.lam3)
        if self.m_is_3:
            ex = jnp.exp(jnp.clip((lam3 * (rij - rik)) ** 3, -69.0, 69.0))
        else:
            ex = jnp.exp(jnp.clip(lam3 * (rij - rik), -69.0, 69.0))
        R3, D3 = p3(self.bigr), p3(self.bigd)
        fc_ik = self._fc(rik, R3, D3)
        term = fc_ik * g * ex
        # mask: k valid, k != j
        K = r.shape[1]
        eye = jnp.eye(K, dtype=bool)[None, :, :]
        tm = mask_j[:, None, :] & mask_j[:, :, None] & ~eye
        zeta = jnp.sum(jnp.where(tm, term, 0.0), axis=-1)  # [N, K]

        bn = p2(self.beta)
        nn = p2(self.n)
        # clamp beta*zeta: beyond ~30 the bond order is already its
        # asymptote (beta*zeta)^(-1/2) to machine precision, and bz^n would
        # overflow fp64 (the reference guards this with piecewise
        # asymptotics in ters_bij)
        bz = jnp.clip(bn * zeta, eps_r, 30.0)
        b = (1.0 + bz**nn) ** (-1.0 / (2.0 * nn))

        e_att = -b * fc_ij * p2(self.bigb) * jnp.exp(-p2(self.lam2) * r_z)

        return 0.5 * jnp.sum(jnp.where(in_j, e_rep + e_att, 0.0))

    def compute(self, state, nl, eflag: bool, vflag: bool,
                special_lj=None, special_coul=None):
        cap = state.capacity
        j = nl.idx
        jc = jnp.clip(j, 0, cap - 1)
        mask_j = (j < cap)
        ti = state.type
        tj = state.type[jc]

        def disp(x):
            xi = x[:, None, :]
            xj = x[jc]
            return state.box.min_image(xi - xj)

        def energy_of(x):
            return self._energy_from_disp(disp(x), mask_j, ti, tj)

        e, neg_f = jax.value_and_grad(energy_of)(state.x)
        f = -neg_f

        virial = None
        if vflag:
            # strain derivative: W_ab = -dE/d eps_ab with dx -> dx + eps dx
            dx0 = disp(state.x)

            def energy_strained(eps):
                dxs = dx0 + dx0 @ eps.T
                return self._energy_from_disp(dxs, mask_j, ti, tj)

            w = -jax.grad(energy_strained)(
                jnp.zeros((3, 3), dtype=state.dtype)
            )
            virial = jnp.stack([
                w[0, 0], w[1, 1], w[2, 2],
                0.5 * (w[0, 1] + w[1, 0]),
                0.5 * (w[0, 2] + w[2, 0]),
                0.5 * (w[1, 2] + w[2, 1]),
            ])
        return f, (e if eflag else None), virial


def read_tersoff_file(path: str, elements: list[str]) -> dict:
    """Parse a .tersoff file (ref: PairTersoff::read_file field order):
    el_i el_j el_k  m gamma lam3 c d h n beta lam2 B R D lam1 A."""
    tokens = []
    with open(path) as f:
        for ln in f:
            ln = ln.split("#")[0].strip()
            if ln:
                tokens.extend(ln.split())
    entries = {}
    pos = 0
    while pos + 17 <= len(tokens):
        e1, e2, e3 = tokens[pos:pos + 3]
        vals = [float(t) for t in tokens[pos + 3:pos + 17]]
        entries[(e1, e2, e3)] = vals
        pos += 17
    return entries


def make_tersoff(
    ntypes: int,
    path: str,
    type_elements: list[str],
    dtype=jnp.float64,
) -> PairTersoff:
    """pair_style tersoff; pair_coeff * * file El1 [El2 ...]."""
    entries = read_tersoff_file(path, type_elements)
    nt = ntypes
    tabs = {f: np.zeros((nt + 1, nt + 1, nt + 1)) for f in _FIELDS}
    for i in range(1, nt + 1):
        for j in range(1, nt + 1):
            for k in range(1, nt + 1):
                key = (type_elements[i - 1], type_elements[j - 1],
                       type_elements[k - 1])
                if key not in entries:
                    raise ValueError(f"missing tersoff entry {key}")
                vals = entries[key]
                for f, v in zip(_FIELDS, vals):
                    tabs[f][i, j, k] = v
    cutmax = float((tabs["bigr"] + tabs["bigd"])[1:, 1:, 1:].max())
    ms = np.unique(tabs["m"][1:, 1:, 1:])
    if not (np.all(ms == 3.0) or np.all(ms == 1.0)):
        raise NotImplementedError("mixed tersoff powerm values")
    return PairTersoff(
        **{f: jnp.asarray(tabs[f], dtype=dtype) for f in _FIELDS},
        ntypes=nt,
        cutmax=cutmax,
        m_is_3=bool(np.all(ms == 3.0)),
    )
