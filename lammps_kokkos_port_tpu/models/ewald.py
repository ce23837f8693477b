"""KSpace style ewald: exact structure-factor Ewald summation.

TPU-native re-design of the reference's Ewald solver
(ref: src/KSPACE/ewald.cpp — k-vector enumeration within gsqmx, structure
factors, self/background corrections). Instead of the reference's
incremental cos/sin recursions, the structure factors are dense matmuls
over a static k-vector table — the natural MXU mapping:

    phase = 2*pi * lamda @ n^T          [N, nk]
    Re S  = q @ cos(phase), Im S = q @ sin(phase)
    E     = qqrd2e * sum_k u_k |S_k|^2 + self + background

Forces come from jax.grad of the energy — exact (the energy is smooth),
eliminating an entire class of sign/convention bugs. The k-space virial
uses the standard analytic vterm (ref: ewald.cpp compute virial block).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from ..utils.units import get_units

Array = jax.Array


def g_ewald_estimate(accuracy_rel: float, cutoff: float, q2: float = 1.0,
                     natoms: int = 1, volume: float = 1.0) -> float:
    """Default splitting parameter (ref: pppm.cpp/ewald.cpp fallback:
    g = (1.35 - 0.15 log(accuracy)) / cutoff)."""
    return (1.35 - 0.15 * np.log(accuracy_rel)) / cutoff


def choose_kmax(g_ewald: float, prd: np.ndarray, accuracy_rel: float
                ) -> tuple[int, int, int]:
    """Per-dim max integer k index so truncated tail < accuracy.

    Uses the standard error criterion: modes with exp(-k^2/(4g^2)) below
    ~accuracy are dropped (the reference solves an error model per dim,
    ewald.cpp setup; this conservative cut matches it closely).
    """
    kcut = 2.0 * g_ewald * np.sqrt(max(-np.log(accuracy_rel), 1.0))
    kmax = np.ceil(kcut * prd / (2.0 * np.pi)).astype(int)
    return tuple(int(max(1, k)) for k in kmax)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["nvec", "ug", "ksq", "kunit"],
    meta_fields=["g_ewald", "accuracy", "dynamic"],
)
@dataclasses.dataclass(frozen=True)
class Ewald:
    """Static k-space tables. nvec: [nk,3] integer modes (half-space, the
    conjugate half is folded into a factor 2 in ug).

    With `dynamic` set (barostat active), the k vectors and mode energies
    are re-derived from state.box at every force evaluation — the analog of
    the reference re-running KSpace::setup() after each NPT box remap
    (ref: src/fix_nh.cpp:874-876). The INTEGER mode set stays the one
    selected for the creation box (valid for modest volume drift)."""

    nvec: Array  # [nk, 3] float (integer values)
    ug: Array  # [nk] 4*pi/V * exp(-k^2/4g^2)/k^2 * (2 for half-space)
    ksq: Array  # [nk]
    kunit: Array  # [nk, 3] k vectors
    g_ewald: float
    accuracy: float
    dynamic: bool = False

    @staticmethod
    def create(box, g_ewald: float, accuracy_rel: float = 1e-6,
               dtype=jnp.float64, dynamic: bool = False) -> "Ewald":
        hinv = np.asarray(jax.device_get(box.h_inv))
        prd = np.asarray(jax.device_get(box.prd))
        vol = float(np.asarray(jax.device_get(box.volume)))
        kx, ky, kz = choose_kmax(g_ewald, prd, accuracy_rel)

        # half-space enumeration (kx>0, or kx=0 & ky>0, or kx=ky=0 & kz>0)
        ns = []
        for n1 in range(0, kx + 1):
            for n2 in range(-ky, ky + 1):
                for n3 in range(-kz, kz + 1):
                    if n1 == 0:
                        if n2 < 0 or (n2 == 0 and n3 <= 0):
                            continue
                    ns.append((n1, n2, n3))
        ns = np.asarray(ns, dtype=np.float64)
        # k = 2 pi * hinv^T n (reciprocal lattice)
        kvec = 2.0 * np.pi * ns @ hinv
        ksq = (kvec**2).sum(axis=1)
        gsqmx = (2.0 * g_ewald * np.sqrt(max(-np.log(accuracy_rel), 1.0))) ** 2
        keep = ksq <= gsqmx * 1.0001
        ns, kvec, ksq = ns[keep], kvec[keep], ksq[keep]

        pref = 4.0 * np.pi / vol
        ug = 2.0 * pref * np.exp(-ksq / (4.0 * g_ewald**2)) / ksq

        return Ewald(
            nvec=jnp.asarray(ns, dtype=dtype),
            ug=jnp.asarray(ug, dtype=dtype),
            ksq=jnp.asarray(ksq, dtype=dtype),
            kunit=jnp.asarray(kvec, dtype=dtype),
            g_ewald=float(g_ewald),
            accuracy=float(accuracy_rel),
            dynamic=dynamic,
        )

    # -- energy/forces -------------------------------------------------------

    def _tables(self, state: State):
        """(ug, ksq, kunit) for the CURRENT box (traced when dynamic)."""
        if not self.dynamic:
            return self.ug, self.ksq, self.kunit
        kvec = 2.0 * jnp.pi * (self.nvec @ state.box.h_inv)
        ksq = jnp.sum(kvec * kvec, axis=1)
        ug = (2.0 * 4.0 * jnp.pi / state.box.volume
              * jnp.exp(-ksq / (4.0 * self.g_ewald**2)) / ksq)
        return ug, ksq, kvec

    def _kspace_energy(self, x: Array, state: State, ug: Array) -> Array:
        """0.5 * sum_k u_k |S(k)|^2 (both half-spaces via the 2 in ug)."""
        q = jnp.where(state.valid_mask, state.q, 0.0)
        lam = state.box.to_lamda(x)
        phase = 2.0 * jnp.pi * (lam @ self.nvec.T)  # [cap, nk]
        re = q @ jnp.cos(phase)
        im = q @ jnp.sin(phase)
        return 0.5 * jnp.sum(ug * (re * re + im * im))

    def _corrections(self, state: State) -> Array:
        """Self-energy + charged-background terms (ref: ewald.cpp compute)."""
        q = jnp.where(state.valid_mask, state.q, 0.0)
        qsqsum = jnp.sum(q * q)
        qsum = jnp.sum(q)
        g = self.g_ewald
        vol = state.box.volume
        e_self = -g / jnp.sqrt(jnp.pi) * qsqsum
        e_bg = -jnp.pi / (2.0 * vol * g * g) * qsum * qsum
        return e_self + e_bg

    def compute(self, state: State, eflag: bool, vflag: bool):
        qqrd2e = get_units(state.units_name).qqr2e
        ug, ksq, kunit = self._tables(state)

        def energy_of(x):
            return qqrd2e * self._kspace_energy(x, state, ug)

        e_k, neg_f = jax.value_and_grad(energy_of)(state.x)
        f = -neg_f

        pe = None
        if eflag:
            pe = e_k + qqrd2e * self._corrections(state)

        virial = None
        if vflag:
            # analytic k-space virial (ref: ewald.cpp vterm block)
            q = jnp.where(state.valid_mask, state.q, 0.0)
            lam = state.box.to_lamda(state.x)
            phase = 2.0 * jnp.pi * (lam @ self.nvec.T)
            re = q @ jnp.cos(phase)
            im = q @ jnp.sin(phase)
            s2 = re * re + im * im
            uk = 0.5 * ug * s2 * qqrd2e
            vterm = -2.0 * (1.0 / ksq + 0.25 / (self.g_ewald**2))
            k = kunit
            v = []
            for a, b in ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)):
                delta = 1.0 if a == b else 0.0
                v.append(jnp.sum(uk * (delta + vterm * k[:, a] * k[:, b])))
            virial = jnp.stack(v)
        return f, pe, virial
