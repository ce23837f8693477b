"""Pair style sw: Stillinger-Weber 3-body potential.

TPU-native re-design of the reference SW (ref: src/MANYBODY/pair_sw.cpp —
twobody/threebody terms, read_file field order: epsilon sigma a lambda
gamma costheta0 A B p q tol; Kokkos twin src/KOKKOS/pair_sw_kokkos.cpp).
Like Tersoff: the total energy is one closed-form expression over the
padded neighbor matrix and forces are its exact jax.grad; the virial is a
strain derivative.

    phi2 = A eps [B (s/r)^p - (s/r)^q] exp(s/(r - a s)),    r < a s
    phi3 = lam eps [cos t - cos0]^2
           exp(gam s/(r_ij - a s)) exp(gam s/(r_ik - a s))
    E = sum_{i<j} phi2 + sum_i sum_{j<k} phi3  (0.5-weighted full sums)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_FIELDS = ["epsilon", "sigma", "a", "lam", "gamma", "cos0", "A", "B",
           "p", "q"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=_FIELDS,
    meta_fields=["ntypes", "cutmax"],
)
@dataclasses.dataclass(frozen=True)
class PairSW:
    """[nt+1]^3 tables indexed (i, j, k); 2-body from the (i,j,j) diagonal."""

    epsilon: Array
    sigma: Array
    a: Array
    lam: Array
    gamma: Array
    cos0: Array
    A: Array
    B: Array
    p: Array
    q: Array
    ntypes: int
    cutmax: float

    def cutsq_table(self) -> Array:
        return jnp.full((self.ntypes + 1, self.ntypes + 1),
                        self.cutmax * self.cutmax)

    def max_cutoff(self) -> float:
        return self.cutmax

    def _energy_from_disp(self, dxj, mask_j, ti, tj):
        r2 = jnp.sum(dxj * dxj, axis=-1)
        r = jnp.sqrt(jnp.where(mask_j, r2, 1.0))
        single = self.ntypes == 1

        def p2(tab):
            if single:
                return tab[1, 1, 1]
            return tab[ti[:, None], tj, tj]

        eps2 = p2(self.epsilon)
        sig2 = p2(self.sigma)
        acut2 = p2(self.a) * sig2  # cutoff radius
        # cap r just inside the cutoff: exp(sigma/(r - a sigma)) is only
        # evaluated where r < cutoff; the capped branch has zero weight but
        # must stay finite for grad (where-NaN pitfall)
        margin = 1e-4
        in_j = mask_j & (r < acut2 - margin * sig2)
        r_s = jnp.where(in_j, r, acut2 - margin * sig2)

        sp = p2(self.p)
        sq = p2(self.q)
        srp = (sig2 / r_s) ** sp
        srq = jnp.where(sq != 0.0, (sig2 / r_s) ** jnp.maximum(sq, 1e-30), 1.0)
        expf = jnp.exp(sig2 / (r_s - acut2))
        phi2 = p2(self.A) * eps2 * (p2(self.B) * srp - srq) * expf
        e2 = 0.5 * jnp.sum(jnp.where(in_j, phi2, 0.0))

        # 3-body over (j, k) neighbor pairs of i
        def p3(tab):
            if single:
                return tab[1, 1, 1]
            return tab[ti[:, None, None], tj[:, :, None], tj[:, None, :]]

        # ij leg uses (i,j,k) params; for single-element all identical
        sig3 = p3(self.sigma)
        acut3 = p3(self.a) * sig3
        gam3 = p3(self.gamma) * sig3
        rij = r_s[:, :, None]
        rik = r_s[:, None, :]
        in3 = in_j[:, :, None] & in_j[:, None, :]
        cos_t = jnp.sum(dxj[:, :, None, :] * dxj[:, None, :, :], axis=-1) / (
            r[:, :, None] * r[:, None, :]
        )
        dcos = cos_t - p3(self.cos0)
        h = (p3(self.lam) * p3(self.epsilon) * dcos * dcos
             * jnp.exp(gam3 / (rij - acut3)) * jnp.exp(gam3 / (rik - acut3)))
        K = r.shape[1]
        eye = jnp.eye(K, dtype=bool)[None, :, :]
        tm = in3 & ~eye
        e3 = 0.5 * jnp.sum(jnp.where(tm, h, 0.0))
        return e2 + e3

    def compute(self, state, nl, eflag: bool, vflag: bool,
                special_lj=None, special_coul=None):
        cap = state.capacity
        j = nl.idx
        jc = jnp.clip(j, 0, cap - 1)
        mask_j = j < cap
        ti = state.type
        tj = state.type[jc]

        def disp(x):
            return state.box.min_image(x[:, None, :] - x[jc])

        def energy_of(x):
            return self._energy_from_disp(disp(x), mask_j, ti, tj)

        e, neg_f = jax.value_and_grad(energy_of)(state.x)
        f = -neg_f

        virial = None
        if vflag:
            dx0 = disp(state.x)

            def energy_strained(eps):
                return self._energy_from_disp(dx0 + dx0 @ eps.T, mask_j, ti, tj)

            w = -jax.grad(energy_strained)(jnp.zeros((3, 3), dtype=state.dtype))
            virial = jnp.stack([
                w[0, 0], w[1, 1], w[2, 2],
                0.5 * (w[0, 1] + w[1, 0]),
                0.5 * (w[0, 2] + w[2, 0]),
                0.5 * (w[1, 2] + w[2, 1]),
            ])
        return f, (e if eflag else None), virial


def read_sw_file(path: str) -> dict:
    """Parse a .sw file: el1 el2 el3 eps sigma a lambda gamma cos0 A B p q
    tol (ref: PairSW::read_file)."""
    tokens = []
    with open(path) as f:
        for ln in f:
            ln = ln.split("#")[0].strip()
            if ln:
                tokens.extend(ln.split())
    entries = {}
    pos = 0
    while pos + 14 <= len(tokens):
        key = tuple(tokens[pos:pos + 3])
        entries[key] = [float(t) for t in tokens[pos + 3:pos + 14]]
        pos += 14
    return entries


def make_sw(ntypes: int, path: str, type_elements: list[str],
            dtype=jnp.float64) -> PairSW:
    entries = read_sw_file(path)
    tabs = {f: np.zeros((ntypes + 1,) * 3) for f in _FIELDS}
    field_order = ["epsilon", "sigma", "a", "lam", "gamma", "cos0", "A", "B",
                   "p", "q"]  # then tol (ignored)
    for i in range(1, ntypes + 1):
        for j in range(1, ntypes + 1):
            for k in range(1, ntypes + 1):
                key = (type_elements[i - 1], type_elements[j - 1],
                       type_elements[k - 1])
                if key not in entries:
                    raise ValueError(f"missing sw entry {key}")
                for f, v in zip(field_order, entries[key]):
                    tabs[f][i, j, k] = v
    cutmax = float((tabs["a"] * tabs["sigma"])[1:, 1:, 1:].max())
    return PairSW(
        **{f: jnp.asarray(tabs[f], dtype=dtype) for f in _FIELDS},
        ntypes=ntypes, cutmax=cutmax,
    )
