"""pair lj/cut/dipole/cut: LJ + charge/dipole electrostatics in a cutoff.

TPU-native equivalent of src/DIPOLE/pair_lj_cut_dipole_cut.cpp. Each pair
can combine charge-charge, dipole-dipole, and charge-dipole interactions;
dipoles feel a torque as well as a force. We evaluate over the FULL padded
neighbor matrix (each pair twice): the pairwise energy expression is
symmetric under i<->j, so energies/virials carry the usual 0.5 weight, and
summing only the *i-side* torque terms per ordered pair reproduces the
half-list i+j tally exactly (the mirrored pair supplies the j side).

Torque is exposed through ``compute_torque`` and flows to the sphere
integrators via ``state.aux["torque"]`` (the atom->torque array analog,
zeroed+accumulated with the forces each step, ref: pair compute
torque[i] += fq*ti*coul).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .pair import gather_pairs

Array = jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lj1", "lj2", "lj3", "lj4", "cut_ljsq", "cut_coulsq"],
    meta_fields=["ntypes", "cut_lj", "cut_coul", "qqrd2e"],
)
@dataclasses.dataclass(frozen=True)
class PairLJCutDipoleCut:
    """Coefficient tables indexed [ti, tj] (row/col 0 unused)."""

    lj1: Array
    lj2: Array
    lj3: Array
    lj4: Array
    cut_ljsq: Array
    cut_coulsq: Array
    ntypes: int
    cut_lj: float
    cut_coul: float
    qqrd2e: float

    has_torque = True

    def cutsq_table(self) -> Array:
        return jnp.maximum(self.cut_ljsq, self.cut_coulsq)

    def max_cutoff(self) -> float:
        return max(self.cut_lj, self.cut_coul)

    def _edges(self, state, nl, eflag, special_lj, special_coul):
        """Per-edge force [cap,K,3], torque-on-i [cap,K,3], energy [cap,K].

        Formulas follow pair_lj_cut_dipole_cut.cpp:64-300 with
        del = x_i - x_j; all branches are written unconditionally (terms
        vanish when q or mu is zero, as the reference's guards imply).
        """
        j, jc, pair_valid, dx, r2 = gather_pairs(state, nl)
        ti = state.type[:, None]
        tj = state.type[jc]
        cut_lj2 = self.cut_ljsq[ti, tj]
        cut_coul2 = self.cut_coulsq[ti, tj]
        valid = pair_valid & (r2 < jnp.maximum(cut_lj2, cut_coul2))
        r2s = jnp.where(valid, r2, 1.0)
        r2inv = 1.0 / r2s
        rinv = jnp.sqrt(r2inv)
        r3inv = r2inv * rinv
        r5inv = r3inv * r2inv
        r7inv = r5inv * r2inv

        q = state.q
        qi = q[:, None]
        qj = q[jc]
        mu = state.aux["mu"]
        mui = jnp.broadcast_to(mu[:, None, :], dx.shape)
        muj = mu[jc]

        coul_on = (valid & (r2 < cut_coul2)).astype(dx.dtype)
        pdotp = jnp.sum(mui * muj, axis=-1)
        pidotr = jnp.sum(mui * dx, axis=-1)
        pjdotr = jnp.sum(muj * dx, axis=-1)

        # dipole-dipole (force + torque-on-i)
        pre1 = 3.0 * r5inv * pdotp - 15.0 * r7inv * pidotr * pjdotr
        pre2 = 3.0 * r5inv * pjdotr
        pre3 = 3.0 * r5inv * pidotr
        pre4 = -r3inv
        fcoul = (pre1[..., None] * dx + pre2[..., None] * mui
                 + pre3[..., None] * muj)
        cross_ij = jnp.cross(mui, muj)
        mu_i_x_r = jnp.cross(mui, dx)
        tcoul = pre4[..., None] * cross_ij + pre2[..., None] * mu_i_x_r

        # charge-charge
        fcoul = fcoul + (qi * qj * r3inv)[..., None] * dx

        # dipole(i)-charge(j)
        pre1c = 3.0 * qj * r5inv * pidotr
        pre2c = qj * r3inv
        fcoul = fcoul + pre2c[..., None] * mui - pre1c[..., None] * dx
        tcoul = tcoul + pre2c[..., None] * mu_i_x_r

        # charge(i)-dipole(j)
        pre1d = 3.0 * qi * r5inv * pjdotr
        pre2d = qi * r3inv
        fcoul = fcoul + pre1d[..., None] * dx - pre2d[..., None] * muj

        # special-bond weights (factor_coul / factor_lj per sbmask)
        w_coul = coul_on
        w_lj = (valid & (r2 < cut_lj2)).astype(dx.dtype)
        if nl.sb is not None:
            if special_coul is not None:
                w_coul = w_coul * jnp.asarray(
                    special_coul, dtype=dx.dtype)[nl.sb]
            if special_lj is not None:
                w_lj = w_lj * jnp.asarray(special_lj, dtype=dx.dtype)[nl.sb]

        fq = w_coul * self.qqrd2e
        r6inv = r2inv * r2inv * r2inv
        flj = r6inv * (self.lj1[ti, tj] * r6inv - self.lj2[ti, tj]) * r2inv
        fedge = fq[..., None] * fcoul + (w_lj * flj)[..., None] * dx
        tedge = fq[..., None] * tcoul

        e = None
        if eflag:
            ecoul = (qi * qj * rinv + r3inv * pdotp
                     - 3.0 * r5inv * pidotr * pjdotr
                     - pre2c * pidotr + pre2d * pjdotr) * fq
            evdwl = r6inv * (self.lj3[ti, tj] * r6inv
                             - self.lj4[ti, tj]) * w_lj
            e = (ecoul, evdwl)
        return fedge, tedge, e, dx, valid

    def compute(self, state, nl, eflag: bool, vflag: bool,
                special_lj=None, special_coul=None):
        f, ev, ec, virial = self.compute_detailed(
            state, nl, eflag, vflag, special_lj=special_lj,
            special_coul=special_coul)
        return f, (ec + ev if eflag else None), virial

    def compute_detailed(self, state, nl, eflag: bool, vflag: bool,
                         special_lj=None, special_coul=None):
        """compute with the (evdwl, ecoul) split the reference tallies
        separately (eng_vdwl vs eng_coul); returns (f, evdwl, ecoul, v6)."""
        fedge, _, e, dx, valid = self._edges(
            state, nl, eflag, special_lj, special_coul)
        f = jnp.sum(fedge, axis=1)
        owned = state.owned_mask
        ecoul = evdwl = None
        if eflag:
            m = valid & owned[:, None]
            ecoul = 0.5 * jnp.sum(jnp.where(m, e[0], 0.0))
            evdwl = 0.5 * jnp.sum(jnp.where(m, e[1], 0.0))
        virial = None
        if vflag:
            w = jnp.where((valid & owned[:, None])[..., None], fedge, 0.0)
            virial = 0.5 * jnp.stack([
                jnp.sum(dx[..., 0] * w[..., 0]),
                jnp.sum(dx[..., 1] * w[..., 1]),
                jnp.sum(dx[..., 2] * w[..., 2]),
                jnp.sum(dx[..., 0] * w[..., 1]),
                jnp.sum(dx[..., 0] * w[..., 2]),
                jnp.sum(dx[..., 1] * w[..., 2]),
            ])
        return f, evdwl, ecoul, virial

    def compute_torque(self, state, nl,
                       special_lj=None, special_coul=None) -> Array:
        """[cap,3] torque on each atom (atom->torque after pair compute)."""
        _, tedge, _, _, _ = self._edges(
            state, nl, False, special_lj, special_coul)
        return jnp.sum(tedge, axis=1)


def make_lj_cut_dipole_cut(ntypes: int, coeff, cut_lj: float,
                           cut_coul: float | None = None, *,
                           qqrd2e: float, mix: str = "geometric",
                           dtype=jnp.float64) -> PairLJCutDipoleCut:
    """coeff: {(i, j): (eps, sigma[, cut_lj[, cut_coul]])}, 1-based types
    (ref: PairLJCutDipoleCut::coeff + init_one geometric mixing)."""
    import numpy as np

    from .pair import mix_epsilon, mix_sigma

    if cut_coul is None:
        cut_coul = cut_lj
    nt = ntypes + 1
    eps = np.zeros((nt, nt))
    sig = np.zeros((nt, nt))
    cl = np.full((nt, nt), cut_lj)
    cc = np.full((nt, nt), cut_coul)
    seen = np.zeros((nt, nt), dtype=bool)
    for (i, ii), vals in coeff.items():
        if len(vals) < 2:
            continue
        eps[i, ii] = eps[ii, i] = float(vals[0])
        sig[i, ii] = sig[ii, i] = float(vals[1])
        if len(vals) > 2:
            cl[i, ii] = cl[ii, i] = float(vals[2])
        if len(vals) > 3:
            cc[i, ii] = cc[ii, i] = float(vals[3])
        seen[i, ii] = seen[ii, i] = True
    for i in range(1, nt):
        for jj in range(i + 1, nt):
            if not seen[i, jj] and seen[i, i] and seen[jj, jj]:
                eps[i, jj] = eps[jj, i] = mix_epsilon(
                    eps[i, i], eps[jj, jj], sig[i, i], sig[jj, jj], mix)
                sig[i, jj] = sig[jj, i] = mix_sigma(sig[i, i], sig[jj, jj],
                                                    mix)
    lj1 = 48.0 * eps * sig ** 12
    lj2 = 24.0 * eps * sig ** 6
    lj3 = 4.0 * eps * sig ** 12
    lj4 = 4.0 * eps * sig ** 6
    arr = lambda a: jnp.asarray(a, dtype=dtype)  # noqa: E731
    return PairLJCutDipoleCut(
        lj1=arr(lj1), lj2=arr(lj2), lj3=arr(lj3), lj4=arr(lj4),
        cut_ljsq=arr(cl ** 2), cut_coulsq=arr(cc ** 2),
        ntypes=ntypes, cut_lj=float(cut_lj), cut_coul=float(cut_coul),
        qqrd2e=float(qqrd2e),
    )
