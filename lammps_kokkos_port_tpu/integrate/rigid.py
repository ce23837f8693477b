"""fix rigid / rigid/nve (+ /small variants): rigid-body dynamics.

TPU-native re-implementation of the reference's RIGID package core
(ref: src/RIGID/fix_rigid.cpp — initial/final_integrate :915,997,
compute_forces_and_torques :1145, set_xv/set_v :1358,1537; quaternion
math src/math_extra.cpp:100 richardson, angmom_to_omega, mq_to_omega;
the /small variants share the physics, differing only in MPI body
storage — moot on a single memory space).

Design: bodies are fixed-width arrays [NB,...]; per-atom body index map
[cap] (-1 = not in a body). All body reductions are segment-sums
(scatter-add), all body updates one vmapped quaternion step — the whole
integrator stays inside the jitted step. Body discovery + principal-axis
setup (Jacobi eigensolve) run host-side once at setup, like
setup_bodies_static.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from .verlet import Integrator

Array = jax.Array

AUX = "rigid"


# -- quaternion helpers (ref: src/math_extra.h/cpp) -------------------------


def _qnormalize(q):
    return q / jnp.sqrt(jnp.sum(q * q))


def _vecquat(a, b):
    """c = (0,a) * b (ref: MathExtra::vecquat)."""
    return jnp.stack([
        -a[0] * b[1] - a[1] * b[2] - a[2] * b[3],
        b[0] * a[0] + a[1] * b[3] - a[2] * b[2],
        b[0] * a[1] + a[2] * b[1] - a[0] * b[3],
        b[0] * a[2] + a[0] * b[2] - a[1] * b[1],
    ])


def _q_to_exyz(q):
    ex = jnp.stack([q[0] * q[0] + q[1] * q[1] - q[2] * q[2] - q[3] * q[3],
                    2.0 * (q[1] * q[2] + q[0] * q[3]),
                    2.0 * (q[1] * q[3] - q[0] * q[2])])
    ey = jnp.stack([2.0 * (q[1] * q[2] - q[0] * q[3]),
                    q[0] * q[0] - q[1] * q[1] + q[2] * q[2] - q[3] * q[3],
                    2.0 * (q[2] * q[3] + q[0] * q[1])])
    ez = jnp.stack([2.0 * (q[1] * q[3] + q[0] * q[2]),
                    2.0 * (q[2] * q[3] - q[0] * q[1]),
                    q[0] * q[0] - q[1] * q[1] - q[2] * q[2] + q[3] * q[3]])
    return ex, ey, ez


def _angmom_to_omega(m, ex, ey, ez, idiag):
    wb = jnp.stack([
        jnp.where(idiag[0] == 0.0, 0.0, jnp.dot(m, ex) / idiag[0]),
        jnp.where(idiag[1] == 0.0, 0.0, jnp.dot(m, ey) / idiag[1]),
        jnp.where(idiag[2] == 0.0, 0.0, jnp.dot(m, ez) / idiag[2]),
    ])
    return wb[0] * ex + wb[1] * ey + wb[2] * ez


def _mq_to_omega(m, q, moments):
    ex, ey, ez = _q_to_exyz(q)
    # rot columns are ex,ey,ez; transpose_matvec(rot, m) = [m.ex, m.ey, m.ez]
    wb = jnp.stack([jnp.dot(m, ex), jnp.dot(m, ey), jnp.dot(m, ez)])
    wb = jnp.where(moments == 0.0, 0.0, wb / jnp.where(moments == 0.0,
                                                       1.0, moments))
    return wb[0] * ex + wb[1] * ey + wb[2] * ez


def _richardson(q, m, w, moments, dtq):
    """(ref: MathExtra::richardson) -> (q_new, w_half)."""
    wq = _vecquat(w, q)
    qfull = _qnormalize(q + dtq * wq)
    qhalf = _qnormalize(q + 0.5 * dtq * wq)
    w2 = _mq_to_omega(m, qhalf, moments)
    wq2 = _vecquat(w2, qhalf)
    qhalf2 = _qnormalize(qhalf + 0.5 * dtq * wq2)
    qnew = _qnormalize(2.0 * qhalf2 - qfull)
    return qnew, w2


@dataclasses.dataclass(frozen=True)
class IntegratorRigid(Integrator):
    """Integrator for `fix <g> rigid|rigid/nve single|molecule|group ...`.

    Atoms outside any body are NOT integrated (the reference decks add a
    separate fix nve for them; the interpreter composes that as this
    integrator's groupbit complement via make-step fix ordering)."""

    nbody: int = 0

    # -- setup (ref: setup_bodies_static/dynamic) ---------------------------

    def setup(self, state: State) -> State:
        if "rigid_body" not in state.aux:
            raise ValueError("IntegratorRigid needs rigid_body in aux "
                             "(installed by build_rigid)")
        body = state.aux["rigid_body"]  # [cap] int32, -1 = free atom
        nb = self.nbody
        x = np.asarray(jax.device_get(state.x), dtype=np.float64)
        v = np.asarray(jax.device_get(state.v), dtype=np.float64)
        img = np.asarray(jax.device_get(state.image))
        prd = np.asarray(jax.device_get(state.box.prd), dtype=np.float64)
        m = np.asarray(jax.device_get(state.per_atom_mass),
                       dtype=np.float64)
        b = np.asarray(jax.device_get(body))
        xu = x + img * prd

        masstotal = np.zeros(nb)
        xcm = np.zeros((nb, 3))
        for i in np.flatnonzero(b >= 0):
            masstotal[b[i]] += m[i]
            xcm[b[i]] += m[i] * xu[i]
        xcm /= masstotal[:, None]

        # inertia tensor + principal axes (ref: :1961-1990)
        inertia = np.zeros((nb, 3))
        ex = np.zeros((nb, 3))
        ey = np.zeros((nb, 3))
        ez = np.zeros((nb, 3))
        for ib in range(nb):
            idx = np.flatnonzero(b == ib)
            d = xu[idx] - xcm[ib]
            mm = m[idx]
            t = np.zeros((3, 3))
            t[0, 0] = np.sum(mm * (d[:, 1] ** 2 + d[:, 2] ** 2))
            t[1, 1] = np.sum(mm * (d[:, 0] ** 2 + d[:, 2] ** 2))
            t[2, 2] = np.sum(mm * (d[:, 0] ** 2 + d[:, 1] ** 2))
            t[0, 1] = t[1, 0] = -np.sum(mm * d[:, 0] * d[:, 1])
            t[0, 2] = t[2, 0] = -np.sum(mm * d[:, 0] * d[:, 2])
            t[1, 2] = t[2, 1] = -np.sum(mm * d[:, 1] * d[:, 2])
            evals, evecs = np.linalg.eigh(t)
            # eigh is ascending; jacobi3 sorts DEscending? the pairing of
            # (moment, axis) is what matters — any consistent order gives
            # identical dynamics
            inertia[ib] = evals
            ex[ib], ey[ib], ez[ib] = evecs[:, 0], evecs[:, 1], evecs[:, 2]
            mx = inertia[ib].max()
            inertia[ib][inertia[ib] < 1e-7 * mx] = 0.0
            # right-handed frame (ref: cross/dot flip)
            if np.dot(np.cross(ex[ib], ey[ib]), ez[ib]) < 0.0:
                ez[ib] = -ez[ib]

        # displace = body-frame coords (ref: :2010-2025)
        disp = np.zeros_like(x)
        for i in np.flatnonzero(b >= 0):
            d = xu[i] - xcm[b[i]]
            disp[i] = [np.dot(d, ex[b[i]]), np.dot(d, ey[b[i]]),
                       np.dot(d, ez[b[i]])]

        # quaternion from frame (ref: exyz_to_q)
        quat = np.zeros((nb, 4))
        for ib in range(nb):
            quat[ib] = _exyz_to_q_np(ex[ib], ey[ib], ez[ib])

        # dynamic: vcm + angmom from current velocities
        # (ref: setup_bodies_dynamic)
        vcm = np.zeros((nb, 3))
        angmom = np.zeros((nb, 3))
        for i in np.flatnonzero(b >= 0):
            vcm[b[i]] += m[i] * v[i]
        vcm /= masstotal[:, None]
        for i in np.flatnonzero(b >= 0):
            d = xu[i] - xcm[b[i]]
            angmom[b[i]] += m[i] * np.cross(d, v[i])

        dt = state.dtype
        aux = {**state.aux, AUX: {
            "xcm": jnp.asarray(xcm, dt), "vcm": jnp.asarray(vcm, dt),
            "angmom": jnp.asarray(angmom, dt),
            "quat": jnp.asarray(quat, dt),
            "inertia": jnp.asarray(inertia, dt),
            "masstotal": jnp.asarray(masstotal, dt),
            "displace": jnp.asarray(disp, dt),
        }}
        return state.replace(aux=aux)

    # -- body force/torque reduction (ref: compute_forces_and_torques) ------

    def _fcm_torque(self, state: State):
        body = state.aux["rigid_body"]
        rb = state.aux[AUX]
        nb = self.nbody
        inb = body >= 0
        bidx = jnp.where(inb, body, 0)
        prd = state.box.prd.astype(state.dtype)
        xu = state.x + state.image.astype(state.dtype) * prd
        f = jnp.where(inb[:, None], state.f, 0.0)
        fcm = jnp.zeros((nb, 3), state.dtype).at[bidx].add(
            f, mode="drop")
        d = xu - rb["xcm"][bidx]
        tq = jnp.cross(d, f)
        tq = jnp.where(inb[:, None], tq, 0.0)
        torque = jnp.zeros((nb, 3), state.dtype).at[bidx].add(
            tq, mode="drop")
        return fcm, torque

    @property
    def dtq(self) -> float:
        return 0.5 * self.dt

    # -- hooks --------------------------------------------------------------

    def initial_integrate(self, state: State) -> State:
        rb = dict(state.aux[AUX])
        fcm, torque = self._fcm_torque(state)
        dtfm = self.dtf / rb["masstotal"][:, None]
        vcm = rb["vcm"] + dtfm * fcm
        xcm = rb["xcm"] + self.dt * vcm
        angmom = rb["angmom"] + self.dtf * torque

        def one(q, m, idiag):
            ex, ey, ez = _q_to_exyz(q)
            w = _angmom_to_omega(m, ex, ey, ez, idiag)
            qn, wh = _richardson(q, m, w, idiag, self.dtq)
            return qn, wh

        quat, omega = jax.vmap(one)(rb["quat"], angmom, rb["inertia"])
        rb.update(vcm=vcm, xcm=xcm, angmom=angmom, quat=quat)
        state = state.replace(aux={**state.aux, AUX: rb})
        return self._set_xv(state, omega)

    def final_integrate(self, state: State) -> State:
        rb = dict(state.aux[AUX])
        fcm, torque = self._fcm_torque(state)
        dtfm = self.dtf / rb["masstotal"][:, None]
        vcm = rb["vcm"] + dtfm * fcm
        angmom = rb["angmom"] + self.dtf * torque

        def omega_of(q, m, idiag):
            ex, ey, ez = _q_to_exyz(q)
            return _angmom_to_omega(m, ex, ey, ez, idiag)

        omega = jax.vmap(omega_of)(rb["quat"], angmom, rb["inertia"])
        rb.update(vcm=vcm, angmom=angmom)
        state = state.replace(aux={**state.aux, AUX: rb})
        return self._set_v(state, omega)

    # -- atom reconstruction (ref: set_xv/set_v) ----------------------------

    def _frames(self, rb):
        ex, ey, ez = jax.vmap(_q_to_exyz)(rb["quat"])
        return ex, ey, ez

    def _set_xv(self, state: State, omega) -> State:
        body = state.aux["rigid_body"]
        rb = state.aux[AUX]
        inb = body >= 0
        bidx = jnp.where(inb, body, 0)
        ex, ey, ez = self._frames(rb)
        disp = rb["displace"]
        # world-frame displacement r = R d
        r = (ex[bidx] * disp[:, 0:1] + ey[bidx] * disp[:, 1:2]
             + ez[bidx] * disp[:, 2:3])
        om = omega[bidx]
        vnew = jnp.cross(om, r) + rb["vcm"][bidx]
        prd = state.box.prd.astype(state.dtype)
        xu = r + rb["xcm"][bidx]
        xnew = xu - state.image.astype(state.dtype) * prd
        x = jnp.where(inb[:, None], xnew, state.x)
        v = jnp.where(inb[:, None], vnew, state.v)
        return state.replace(x=x, v=v)

    def _set_v(self, state: State, omega) -> State:
        body = state.aux["rigid_body"]
        rb = state.aux[AUX]
        inb = body >= 0
        bidx = jnp.where(inb, body, 0)
        ex, ey, ez = self._frames(rb)
        disp = rb["displace"]
        r = (ex[bidx] * disp[:, 0:1] + ey[bidx] * disp[:, 1:2]
             + ez[bidx] * disp[:, 2:3])
        vnew = jnp.cross(omega[bidx], r) + rb["vcm"][bidx]
        v = jnp.where(inb[:, None], vnew, state.v)
        return state.replace(v=v)


def _exyz_to_q_np(ex, ey, ez):
    """(ref: MathExtra::exyz_to_q)"""
    q = np.zeros(4)
    q0sq = 0.25 * (ex[0] + ey[1] + ez[2] + 1.0)
    q1sq = q0sq - 0.5 * (ey[1] + ez[2])
    q2sq = q0sq - 0.5 * (ex[0] + ez[2])
    q3sq = q0sq - 0.5 * (ex[0] + ey[1])
    if q0sq >= 0.25:
        q[0] = np.sqrt(q0sq)
        q[1] = (ey[2] - ez[1]) / (4.0 * q[0])
        q[2] = (ez[0] - ex[2]) / (4.0 * q[0])
        q[3] = (ex[1] - ey[0]) / (4.0 * q[0])
    elif q1sq >= 0.25:
        q[1] = np.sqrt(q1sq)
        q[0] = (ey[2] - ez[1]) / (4.0 * q[1])
        q[2] = (ey[0] + ex[1]) / (4.0 * q[1])
        q[3] = (ex[2] + ez[0]) / (4.0 * q[1])
    elif q2sq >= 0.25:
        q[2] = np.sqrt(q2sq)
        q[0] = (ez[0] - ex[2]) / (4.0 * q[2])
        q[1] = (ey[0] + ex[1]) / (4.0 * q[2])
        q[3] = (ez[1] + ey[2]) / (4.0 * q[2])
    else:
        q[3] = np.sqrt(q3sq)
        q[0] = (ex[1] - ey[0]) / (4.0 * q[3])
        q[1] = (ez[0] + ex[2]) / (4.0 * q[3])
        q[2] = (ez[1] + ey[2]) / (4.0 * q[3])
    return q / np.linalg.norm(q)


def build_rigid_bodies(
    cap: int,
    groupmask: np.ndarray,        # [cap] bool: atoms in the fix group
    style: str,                   # single | molecule | group
    molecule: np.ndarray | None = None,   # [cap] molecule ids
    group_masks: list | None = None,      # for style group: list of bool[cap]
) -> tuple[np.ndarray, int]:
    """Host-side body assignment (ref: FixRigid ctor body styles).
    Returns (body[cap] int32 with -1 for free atoms, nbody)."""
    body = np.full(cap, -1, dtype=np.int32)
    if style == "single":
        body[groupmask] = 0
        return body, 1
    if style == "molecule":
        mols = np.unique(molecule[groupmask])
        for ib, mol in enumerate(sorted(mols)):
            body[groupmask & (molecule == mol)] = ib
        return body, len(mols)
    if style == "group":
        for ib, gm in enumerate(group_masks):
            body[groupmask & gm] = ib
        return body, len(group_masks)
    raise ValueError(style)
