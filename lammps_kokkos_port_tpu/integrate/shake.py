"""fix shake / rattle: holonomic bond (and angle) constraints.

TPU-native equivalent of the reference's SHAKE
(ref: src/RIGID/fix_shake.cpp — cluster discovery :1782-1900, per-cluster
Lagrange solves in post_force :630; Kokkos twin fix_shake_kokkos.cpp; needed
for the rhodopsin benchmark, bench/in.rhodo:16).

Design difference: the reference solves each 2/3/4-atom cluster's
multipliers analytically inside the force pass; here the classic
SHAKE/RATTLE splitting runs as fixed-iteration Jacobi sweeps over ALL
constraints at once (clusters are disjoint and tiny, so a handful of
damped sweeps converges to machine tolerance) — fully vectorized
scatter-adds, no per-cluster control flow:

  - post_integrate: iterative position correction along the pre-step bond
    directions (SHAKE),
  - end_of_step: velocity projection (RATTLE) so v stays tangent to the
    constraint manifold.

Angle constraints (e.g. the water H-H distance) become a third distance
constraint, exactly like `fix shake ... a <angletypes>` in the reference.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from .verlet import AuxFix

Array = jax.Array

AUX_X0 = "shake_x0"


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ci", "cj", "d0"],
    meta_fields=["iters", "viters", "groupbit", "ncons"],
)
@dataclasses.dataclass(frozen=True)
class FixShake(AuxFix):
    """Distance constraints (ci, cj, d0); padded entries have ci == cap."""

    ci: Array  # [NC] int32
    cj: Array  # [NC] int32
    d0: Array  # [NC]
    iters: int = 50
    viters: int = 50
    groupbit: int = 1
    ncons: int = 0  # true (unpadded) count; removes one DOF each
                    # (ref: FixShake::dof, src/RIGID/fix_shake.cpp)

    # -- hooks ---------------------------------------------------------------

    def setup(self, state: State) -> State:
        # key must exist before the scan starts (stable carry structure)
        return state.replace(aux={**state.aux, AUX_X0: state.x})

    def initial_integrate(self, state: State) -> State:
        # stash pre-step positions: constraint gradients are evaluated at
        # the old geometry (classic SHAKE)
        return state.replace(aux={**state.aux, AUX_X0: state.x})

    def post_integrate(self, state: State) -> State:
        cap = state.capacity
        x0 = state.aux[AUX_X0]
        m = state.per_atom_mass
        ci = jnp.clip(self.ci, 0, cap - 1)
        cj = jnp.clip(self.cj, 0, cap - 1)
        valid = (self.ci < cap)
        invmi = jnp.where(valid, 1.0 / m[ci], 0.0)
        invmj = jnp.where(valid, 1.0 / m[cj], 0.0)
        r_old = state.box.min_image(x0[ci] - x0[cj])  # fixed directions
        d0sq = self.d0 * self.d0

        def body(_, x):
            r_new = state.box.min_image(x[ci] - x[cj])
            diff = d0sq - jnp.sum(r_new * r_new, axis=-1)
            denom = 2.0 * jnp.sum(r_new * r_old, axis=-1) * (invmi + invmj)
            g = jnp.where(valid, diff / jnp.where(
                jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
            dxi = (g * invmi)[:, None] * r_old
            dxj = -(g * invmj)[:, None] * r_old
            x = x.at[self.ci].add(dxi, mode="drop")
            x = x.at[self.cj].add(dxj, mode="drop")
            return x

        x = jax.lax.fori_loop(0, self.iters, body, state.x)
        return state.replace(x=x)

    def end_of_step(self, state: State) -> State:
        """RATTLE velocity projection (ref: fix_rattle semantics)."""
        cap = state.capacity
        m = state.per_atom_mass
        ci = jnp.clip(self.ci, 0, cap - 1)
        cj = jnp.clip(self.cj, 0, cap - 1)
        valid = self.ci < cap
        invmi = jnp.where(valid, 1.0 / m[ci], 0.0)
        invmj = jnp.where(valid, 1.0 / m[cj], 0.0)
        r = state.box.min_image(state.x[ci] - state.x[cj])
        r2 = jnp.sum(r * r, axis=-1)

        def body(_, v):
            vij = v[ci] - v[cj]
            lam = jnp.where(
                valid,
                jnp.sum(vij * r, axis=-1) / (r2 * (invmi + invmj) + 1e-300),
                0.0,
            )
            v = v.at[self.ci].add(-(lam * invmi)[:, None] * r, mode="drop")
            v = v.at[self.cj].add((lam * invmj)[:, None] * r, mode="drop")
            return v

        v = jax.lax.fori_loop(0, self.viters, body, state.v)
        return state.replace(v=v)

    # -- diagnostics ----------------------------------------------------------

    def max_violation(self, state: State) -> Array:
        cap = state.capacity
        ci = jnp.clip(self.ci, 0, cap - 1)
        cj = jnp.clip(self.cj, 0, cap - 1)
        valid = self.ci < cap
        r = state.box.min_image(state.x[ci] - state.x[cj])
        d = jnp.sqrt(jnp.sum(r * r, axis=-1))
        return jnp.max(jnp.where(valid, jnp.abs(d - self.d0), 0.0))

    @property
    def n_constraints(self) -> int:
        return self.ncons


def make_shake(
    cap: int,
    bonds: np.ndarray,  # [NB, 3] (type, i, j) local indices
    bond_types: list[int],
    bond_r0: dict[int, float],
    angles: np.ndarray | None = None,  # [NA, 4] (type, i, j, k)
    angle_types: list[int] | None = None,
    angle_theta0: dict[int, float] | None = None,  # radians
    pad_multiple: int = 8,
    dtype=jnp.float64,
) -> FixShake:
    """Build the constraint list like `fix shake b <btypes> a <atypes>`
    (ref: FixShake::init cluster setup): constrained bonds pin their
    equilibrium length; constrained angles add the 1-3 distance from the
    law of cosines over the two constrained bonds."""
    ci, cj, d0 = [], [], []
    bond_len = {}
    for t, i, j in np.asarray(bonds):
        if int(t) in bond_types:
            ci.append(int(i))
            cj.append(int(j))
            d0.append(bond_r0[int(t)])
            bond_len[(int(i), int(j))] = bond_r0[int(t)]
            bond_len[(int(j), int(i))] = bond_r0[int(t)]
    if angles is not None and angle_types:
        for t, i, j, k in np.asarray(angles):
            if int(t) in angle_types:
                r1 = bond_len.get((int(i), int(j)))
                r2 = bond_len.get((int(k), int(j)))
                if r1 is None or r2 is None:
                    raise ValueError(
                        "shake angle requires both flanking bonds constrained"
                    )
                th = angle_theta0[int(t)]
                d13 = np.sqrt(r1 * r1 + r2 * r2
                              - 2.0 * r1 * r2 * np.cos(th))
                ci.append(int(i))
                cj.append(int(k))
                d0.append(d13)
    n = len(ci)
    npad = max(((n + pad_multiple - 1) // pad_multiple) * pad_multiple,
               pad_multiple)
    a_ci = np.full(npad, cap, dtype=np.int32)
    a_cj = np.full(npad, cap, dtype=np.int32)
    a_d0 = np.ones(npad)
    a_ci[:n] = ci
    a_cj[:n] = cj
    a_d0[:n] = d0
    return FixShake(
        ci=jnp.asarray(a_ci), cj=jnp.asarray(a_cj),
        d0=jnp.asarray(a_d0, dtype=dtype), ncons=n,
    )


# ---------------------------------------------------------------------------
# Reference-formulation SHAKE: constraint FORCES solved per cluster in
# post_force (ref: fix_shake.cpp:630 post_force -> unconstrained_update +
# shake/shake3/shake4/shake3angle). One generic vmapped solver covers all
# four specializations: with g_{cc'} = sum_i invm_i sign_c(i) sign_{c'}(i)
# the reference's matrices are A_{cc'} = 2 g_{cc'} (s_c . r_{c'}) and its
# quadratic corrections are quad_c = |sum_{c'} g_{cc'} lamda_{c'} r_{c'}|^2.
# Single-constraint clusters use the exact closed-form quadratic root
# (smaller |lamda|), multi-constraint clusters the reference's fixed-point
# iteration with identical stopping rule (|dlamda| <= tolerance, max_iter).
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["atoms", "d", "nc", "aflag"],
    meta_fields=["tol", "max_iter", "dtv", "dtfsq", "ncons", "groupbit"],
)
@dataclasses.dataclass(frozen=True)
class FixShakeClusters(AuxFix):
    """SHAKE clusters: atoms [NCL,4] (central first; pad slots = cap),
    d [NCL,3] constraint targets, nc [NCL] active-constraint count,
    aflag [NCL] 1 when constraint 2 is the angle 1-3 distance (1,2)
    instead of the bond (0,3)."""

    atoms: Array
    d: Array
    nc: Array
    aflag: Array
    tol: float = 1e-4
    max_iter: int = 20
    dtv: float = 0.005
    dtfsq: float = 0.0
    ncons: int = 0
    groupbit: int = 1

    @property
    def n_constraints(self) -> int:
        # each constraint removes one DOF (ref: FixShake::dof)
        return self.ncons

    def max_violation(self, state: State) -> Array:
        """max |r_c - d_c| over all active constraints (diagnostic; the
        reference prints per-cluster stats every `output_every` steps)."""
        cap = state.capacity
        safe = jnp.minimum(self.atoms, cap - 1)
        x = state.x[safe]                      # [NCL, 4, 3]
        pa = jnp.broadcast_to(jnp.array([0, 0, 0]), self.nc.shape + (3,))
        pb = jnp.broadcast_to(jnp.array([1, 2, 3]), self.nc.shape + (3,))
        a3 = jnp.where(self.aflag > 0, 1, 0)
        b3 = jnp.where(self.aflag > 0, 2, 3)
        pa = pa.at[:, 2].set(a3)
        pb = pb.at[:, 2].set(b3)
        r = (jnp.take_along_axis(x, pa[..., None], axis=1)
             - jnp.take_along_axis(x, pb[..., None], axis=1))
        d = jnp.sqrt(jnp.sum(r * r, axis=-1))  # [NCL, 3]
        active = jnp.arange(3)[None, :] < self.nc[:, None]
        return jnp.max(jnp.where(active, jnp.abs(d - self.d), 0.0))

    def _solve(self, state: State, x_all, xs_all):
        """Per-cluster Lagrange solve. Returns (dfsum [NCL,4,3], aidx):
        dfsum[a] = sum_c sign_c(a) lamda_c r_c, UNSCALED by 1/dtfsq —
        post_force divides by dtfsq for forces, setup_post_force uses it
        directly as the coordinate correction (dtfsq cancels,
        ref: fix_shake.cpp:3243-3265 correct_coordinates)."""
        cap = state.capacity
        invm_all = 1.0 / state.per_atom_mass

        def cluster(aidx, dtgt, nc, aflag):
            safe = jnp.minimum(aidx, cap - 1)
            pad = aidx >= cap
            xc = x_all[safe]
            sc = xs_all[safe]
            im = jnp.where(pad, 0.0, invm_all[safe])

            # canonical constraint pairs: (0,1), (0,2), aflag?(1,2):(0,3)
            pa = jnp.array([0, 0, 0])
            pb = jnp.array([1, 2, 3])
            pa = pa.at[2].set(jnp.where(aflag > 0, 1, 0))
            pb = pb.at[2].set(jnp.where(aflag > 0, 2, 3))
            active = jnp.arange(3) < nc

            r = xc[pa] - xc[pb]       # [3,3]
            s = sc[pa] - sc[pb]
            # sign matrix sign_c(i): [3 constraints, 4 atoms]
            sign = (jnp.zeros((3, 4))
                    .at[jnp.arange(3), pa].add(1.0)
                    .at[jnp.arange(3), pb].add(-1.0))
            sign = sign * active[:, None]
            g = jnp.einsum("ca,a,da->cd", sign, im, sign)  # [3,3]

            A = 2.0 * g * (s @ r.T)  # A_{cc'} = 2 g_{cc'} (s_c . r_c')
            # mask inactive rows/cols to identity for a safe inverse
            eye = jnp.eye(3)
            msk2 = active[:, None] & active[None, :]
            A = jnp.where(msk2, A, eye)
            Ainv = jnp.linalg.inv(A)

            rr = r @ r.T  # (r_c . r_c')
            ssq = jnp.sum(s * s, axis=1)
            dsq = dtgt * dtgt

            def quad(lam):
                # |sum_c' g_{cc'} lam_c' r_c'|^2 row-wise
                coef = g * lam[None, :]          # [c, c']
                return jnp.einsum("cd,ce,de->c", coef, coef, rr)

            # closed-form single-constraint root (ref shake())
            a_q = g[0, 0] * g[0, 0] * rr[0, 0]
            b_q = A[0, 0]
            c_q = ssq[0] - dsq[0]
            det = jnp.maximum(b_q * b_q - 4.0 * a_q * c_q, 0.0)
            sq = jnp.sqrt(det)
            l1 = (-b_q + sq) / (2.0 * a_q)
            l2 = (-b_q - sq) / (2.0 * a_q)
            lam_closed = jnp.where(jnp.abs(l1) <= jnp.abs(l2), l1, l2)

            # fixed-point iteration (ref shake3/shake4/shake3angle)
            def cond(carry):
                lam, prev, it = carry
                notdone = jnp.any(
                    jnp.where(active, jnp.abs(lam - prev) > self.tol,
                              False))
                first = it == 0
                return (first | notdone) & (it < self.max_iter)

            def body(carry):
                lam, _, it = carry
                b = jnp.where(active, dsq - ssq - quad(lam), 0.0)
                lam_new = Ainv @ b
                return lam_new, lam, it + 1

            # derive the zero init from r so the carry inherits r's
            # varying manual axes under shard_map (parallel/molecular.py
            # runs this solve per shard; a plain jnp.zeros carry would be
            # unvarying and fail while_loop's carry-type check)
            lam0 = 0.0 * r[:, 0]
            lam_it, _, _ = jax.lax.while_loop(cond, body,
                                              (lam0, lam0, 0))
            lam = jnp.where(nc == 1,
                            jnp.array([1.0, 0.0, 0.0]) * lam_closed,
                            lam_it)
            lam = jnp.where(active, lam, 0.0)

            # +lam_c r_c on pa, -lam_c r_c on pb
            df = jnp.einsum("ca,c,cx->ax", sign, lam, r)  # [4 atoms, 3]
            return df, im

        df, im = jax.vmap(cluster)(self.atoms, self.d, self.nc,
                                   self.aflag)
        return df, im

    def post_force(self, state: State) -> State:
        if self.atoms.shape[0] == 0:
            return state
        invm_all = 1.0 / state.per_atom_mass
        xs_all = (state.x + self.dtv * state.v
                  + (self.dtfsq * invm_all)[:, None] * state.f)
        df, _ = self._solve(state, state.x, xs_all)
        f = state.f.at[self.atoms.reshape(-1)].add(
            (df / self.dtfsq).reshape(-1, 3).astype(state.dtype),
            mode="drop")
        return state.replace(f=f)

    def setup_post_force(self, state: State) -> State:
        """Run-setup sequence (ref: FixShake::setup, fix_shake.cpp:465-512):
        1. correct_coordinates — project x exactly onto the constraint
           manifold (solve with v=f=0, i.e. xshake = x; the correction
           (1/m) sign lamda r is dtfsq-free);
        2. shake_end_of_step — constraint force for the FIRST half kick
           only, so the prediction and the force scaling use
           dtfsq/2 (the setup velocity is full-step: the force acts
           through one half kick before the next drift)."""
        if self.atoms.shape[0] == 0:
            return state
        # 1. coordinate projection
        df, im = self._solve(state, state.x, state.x)
        corr = df * im[..., None]
        x = state.x.at[self.atoms.reshape(-1)].add(
            corr.reshape(-1, 3).astype(state.dtype), mode="drop")
        state = state.replace(x=x)
        # 2. half-kick constraint force
        half = 0.5 * self.dtfsq
        invm_all = 1.0 / state.per_atom_mass
        xs_all = (state.x + self.dtv * state.v
                  + (half * invm_all)[:, None] * state.f)
        df, _ = self._solve(state, state.x, xs_all)
        f = state.f.at[self.atoms.reshape(-1)].add(
            (df / half).reshape(-1, 3).astype(state.dtype), mode="drop")
        return state.replace(f=f)


def make_shake_clusters(
    cap: int,
    bonds: np.ndarray,  # [NB, 3] (type, i, j) constrained bonds, local idx
    bond_r0: dict[int, float],
    angles: np.ndarray | None = None,  # [NA, 4] (type, i, j, k) constrained
    angle_theta0: dict[int, float] | None = None,  # radians
    tol: float = 1e-4,
    max_iter: int = 20,
    dt: float = 0.005,
    ftm2v: float = 1.0,
    dtype=jnp.float64,
) -> FixShakeClusters:
    """Cluster discovery (ref: FixShake::init): constrained bonds form
    star graphs (central atom + <=3 partners); a constrained angle whose
    flanking bonds are both constrained adds the law-of-cosines 1-3
    distance (shake3angle)."""
    from collections import defaultdict

    nbr_map = defaultdict(list)
    blen = {}
    for t, i, j in np.asarray(bonds):
        nbr_map[int(i)].append(int(j))
        nbr_map[int(j)].append(int(i))
        blen[(int(i), int(j))] = bond_r0[int(t)]
        blen[(int(j), int(i))] = bond_r0[int(t)]

    angle_d13 = {}
    if angles is not None and angle_theta0:
        for t, i, j, k in np.asarray(angles):
            r1 = blen.get((int(i), int(j)))
            r2 = blen.get((int(k), int(j)))
            if r1 is None or r2 is None:
                raise ValueError(
                    "shake angle requires both flanking bonds constrained")
            th = angle_theta0[int(t)]
            angle_d13[int(j)] = (int(i), int(k),
                                 float(np.sqrt(r1 * r1 + r2 * r2
                                               - 2 * r1 * r2 * np.cos(th))))

    # centrals: atoms with >1 constrained bond, else either bond atom
    visited = set()
    atoms_list, d_list, nc_list, af_list = [], [], [], []
    centrals = sorted(nbr_map, key=lambda a: -len(nbr_map[a]))
    for c in centrals:
        if c in visited:
            continue
        parts = [p for p in nbr_map[c] if p not in visited]
        if not parts:
            continue
        if len(parts) > 3:
            raise ValueError(
                f"shake cluster of size {len(parts)+1} unsupported "
                "(ref: max 4 atoms)")
        visited.add(c)
        visited.update(parts)
        slots = [c] + parts + [cap] * (3 - len(parts))
        d = [blen[(c, p)] for p in parts] + [0.0] * (3 - len(parts))
        nc = len(parts)
        aflag = 0
        if c in angle_d13 and len(parts) == 2:
            i, k, d13 = angle_d13[c]
            if {i, k} == set(parts):
                # order partners to match (i, k)
                slots = [c, i, k, cap]
                d = [blen[(c, i)], blen[(c, k)], d13]
                nc = 3
                aflag = 1
        atoms_list.append(slots)
        d_list.append(d)
        nc_list.append(nc)
        af_list.append(aflag)

    n = len(atoms_list)
    npad = max(((n + 7) // 8) * 8, 8)
    atoms = np.full((npad, 4), cap, dtype=np.int32)
    dts = np.zeros((npad, 3))
    ncs = np.zeros(npad, dtype=np.int32)
    afs = np.zeros(npad, dtype=np.int32)
    if n:
        atoms[:n] = np.asarray(atoms_list, dtype=np.int32)
        dts[:n] = np.asarray(d_list)
        ncs[:n] = np.asarray(nc_list)
        afs[:n] = np.asarray(af_list)
    ncons = int(sum(nc_list))
    # SHAKE predicts the NEXT position: the constraint force acts through
    # BOTH half kicks, so dtfsq = dt^2 ftm2v (the 0.5 factor is RATTLE's,
    # ref: fix_shake.cpp:482-483)
    return FixShakeClusters(
        atoms=jnp.asarray(atoms), d=jnp.asarray(dts, dtype=dtype),
        nc=jnp.asarray(ncs), aflag=jnp.asarray(afs),
        tol=float(tol), max_iter=int(max_iter), dtv=float(dt),
        dtfsq=float(dt * dt * ftm2v), ncons=ncons,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["atoms", "d", "nc", "aflag"],
    meta_fields=["tol", "max_iter", "dtv", "dtfsq", "ncons", "groupbit"],
)
@dataclasses.dataclass(frozen=True)
class FixRattleClusters(FixShakeClusters):
    """fix rattle (ref: src/RIGID/fix_rattle.cpp): SHAKE's coordinate
    constraint force PLUS an exact velocity constraint so v stays tangent
    to the manifold.

    Per reference step ordering (rattle comes after all integration
    fixes): post_force solves the LINEAR velocity system on the predicted
    full-step velocities and corrects v in place (vrattle2/3/4/3angle,
    fix_rattle.cpp:231-516); the coordinate constraint force is applied
    AFTER the final kick (our end_of_step slot = the reference's
    FixRattle::final_integrate) with dtfsq = dt^2/2 ftm2v ALWAYS (the
    force only acts through the next initial half kick;
    fix_shake.cpp:482-483 keeps the half factor when rattle)."""

    def _solve_v(self, state: State, vp_all):
        """Velocity-constraint corrections: dv[a] = invm_a sum_c
        sign_c(a) l_c r_c with A l = c, A_{cc'} = g_{cc'} (r_c . r_c'),
        c_c = -(vp_pa - vp_pb) . r_c — the reference's exact 1x1/2x2/3x3
        solves in one masked form."""
        cap = state.capacity
        invm_all = 1.0 / state.per_atom_mass
        x_all = state.x

        def cluster(aidx, nc, aflag):
            safe = jnp.minimum(aidx, cap - 1)
            pad = aidx >= cap
            xc = x_all[safe]
            vc = vp_all[safe]
            im = jnp.where(pad, 0.0, invm_all[safe])

            pa = jnp.array([0, 0, 0])
            pb = jnp.array([1, 2, 3])
            pa = pa.at[2].set(jnp.where(aflag > 0, 1, 0))
            pb = pb.at[2].set(jnp.where(aflag > 0, 2, 3))
            active = jnp.arange(3) < nc

            r = xc[pa] - xc[pb]
            dv = vc[pa] - vc[pb]
            sign = (jnp.zeros((3, 4))
                    .at[jnp.arange(3), pa].add(1.0)
                    .at[jnp.arange(3), pb].add(-1.0))
            sign = sign * active[:, None]
            g = jnp.einsum("ca,a,da->cd", sign, im, sign)

            A = g * (r @ r.T)
            eye = jnp.eye(3)
            msk2 = active[:, None] & active[None, :]
            A = jnp.where(msk2, A, eye)
            c = jnp.where(active, -jnp.sum(dv * r, axis=1), 0.0)
            l = jnp.linalg.solve(A, c)
            l = jnp.where(active, l, 0.0)
            dvc = im[:, None] * jnp.einsum("ca,c,cx->ax", sign, l, r)
            return dvc

        return jax.vmap(cluster)(self.atoms, self.nc, self.aflag)

    def post_force(self, state: State) -> State:
        """Velocity correction on the predicted v(t+dt)
        (ref: FixRattle::post_force -> update_v_half_nocons + vrattle*)."""
        if self.atoms.shape[0] == 0:
            return state
        # dtfv = 0.5 dt ftm2v (ref: update_v_half_nocons); dtfsq is
        # already 0.5 dt^2 ftm2v for rattle, so dtfv = dtfsq / dt
        dtfv = self.dtfsq / self.dtv
        invm = 1.0 / state.per_atom_mass
        vp = state.v + (dtfv * invm)[:, None] * state.f
        dvc = self._solve_v(state, vp)
        v = state.v.at[self.atoms.reshape(-1)].add(
            dvc.reshape(-1, 3).astype(state.dtype), mode="drop")
        return state.replace(v=v)

    def end_of_step(self, state: State) -> State:
        """Coordinate constraint force for the NEXT step's initial kick
        (ref: FixRattle::final_integrate -> FixShake::post_force with the
        half dtfsq)."""
        if self.atoms.shape[0] == 0:
            return state
        invm_all = 1.0 / state.per_atom_mass
        xs_all = (state.x + self.dtv * state.v
                  + (self.dtfsq * invm_all)[:, None] * state.f)
        df, _ = self._solve(state, state.x, xs_all)
        f = state.f.at[self.atoms.reshape(-1)].add(
            (df / self.dtfsq).reshape(-1, 3).astype(state.dtype),
            mode="drop")
        return state.replace(f=f)

    def setup_post_force(self, state: State) -> State:
        """Setup (ref: FixShake::setup with rattle=1): project coordinates,
        remove velocity components along bonds (correct_velocities with
        vp = v, fix_rattle.cpp:746-780), then the half-kick constraint
        force."""
        if self.atoms.shape[0] == 0:
            return state
        # 1. coordinate projection
        df, im = self._solve(state, state.x, state.x)
        corr = df * im[..., None]
        x = state.x.at[self.atoms.reshape(-1)].add(
            corr.reshape(-1, 3).astype(state.dtype), mode="drop")
        state = state.replace(x=x)
        # 2. velocity projection (instantaneous: vp = v)
        dvc = self._solve_v(state, state.v)
        v = state.v.at[self.atoms.reshape(-1)].add(
            dvc.reshape(-1, 3).astype(state.dtype), mode="drop")
        state = state.replace(v=v)
        # 3. constraint force for the first half kick (dtfsq already half)
        invm_all = 1.0 / state.per_atom_mass
        xs_all = (state.x + self.dtv * state.v
                  + (self.dtfsq * invm_all)[:, None] * state.f)
        df, _ = self._solve(state, state.x, xs_all)
        f = state.f.at[self.atoms.reshape(-1)].add(
            (df / self.dtfsq).reshape(-1, 3).astype(state.dtype),
            mode="drop")
        return state.replace(f=f)


def make_rattle_clusters(*args, **kw) -> FixRattleClusters:
    """fix rattle factory: identical cluster discovery; dtfsq stays at
    dt^2/2 ftm2v (ref: fix_shake.cpp:482 keeps the half factor when
    rattle)."""
    base = make_shake_clusters(*args, **kw)
    return FixRattleClusters(
        atoms=base.atoms, d=base.d, nc=base.nc, aflag=base.aflag,
        tol=base.tol, max_iter=base.max_iter, dtv=base.dtv,
        dtfsq=0.5 * base.dtfsq, ncons=base.ncons, groupbit=base.groupbit,
    )
