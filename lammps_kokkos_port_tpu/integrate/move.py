"""fix move: prescribed group motion (linear / wiggle / rotate / transrot).

TPU-native equivalent of src/fix_move.cpp (initial_integrate :505,
styles enum :42). Prescribed dimensions override integration with the
closed-form trajectory from the stored unwrapped original coordinates;
NULL dimensions do plain velocity-Verlet. Atoms outside the group are
not integrated (the reference decks pair fix move with other
integrators per group; here the interpreter composes one integrator).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.state import State
from .verlet import Integrator

Array = jax.Array

AUX_X0 = "move_x0"


@dataclasses.dataclass(frozen=True)
class IntegratorMove(Integrator):
    """style linear|wiggle|rotate|transrot; prescribed components are
    floats, None = NULL (free dim, plain NVE)."""

    style: str = "linear"
    vel: tuple = (None, None, None)    # linear / transrot translation
    amp: tuple = (None, None, None)    # wiggle amplitudes
    point: tuple = (0.0, 0.0, 0.0)     # rotate/transrot
    axis: tuple = (0.0, 0.0, 1.0)
    period: float = 1.0
    time_origin: int = 0
    dvars: tuple = (None, None, None)  # variable style: displacement
    vvars: tuple = (None, None, None)  # variable style: velocity

    def setup(self, state: State) -> State:
        prd = state.box.prd.astype(state.dtype)
        xu = state.x + state.image.astype(state.dtype) * prd
        return state.replace(aux={**state.aux, AUX_X0: xu})

    @property
    def omega_rotate(self) -> float:
        import math

        return 2.0 * math.pi / self.period

    def _delta(self, state: State):
        return ((state.ntimestep - self.time_origin)
                .astype(state.dtype) * self.dt)

    def _nve_free(self, state: State, free: tuple, drift: bool) -> State:
        """Half kick (+ optional drift) on the free dims of group atoms."""
        g = self._gmask(state)
        m = state.per_atom_mass[:, None]
        sel = jnp.asarray([1.0 if f else 0.0 for f in free], state.dtype)
        v = state.v + jnp.where(g, self.dtf * state.f / m * sel, 0.0)
        state = state.replace(v=v)
        if drift:
            x = state.x + jnp.where(g, self.dt * state.v * sel, 0.0)
            state = state.replace(x=x)
        return state

    def _apply(self, state: State, xu_new, v_new, mask3) -> State:
        """Overwrite prescribed dims (mask3 floats) for group atoms."""
        g = self._gmask(state)
        prd = state.box.prd.astype(state.dtype)
        xw = xu_new - state.image.astype(state.dtype) * prd
        sel = mask3[None, :]
        x = jnp.where(g, state.x * (1 - sel) + xw * sel, state.x)
        v = jnp.where(g, state.v * (1 - sel) + v_new * sel, state.v)
        return state.replace(x=x, v=v)

    def initial_integrate(self, state: State) -> State:
        dt_ = state.dtype
        delta = self._delta(state)
        x0 = state.aux[AUX_X0]
        if self.style == "linear":
            free = tuple(c is None for c in self.vel)
            state = self._nve_free(state, free, drift=True)
            vv = jnp.asarray([0.0 if c is None else float(c)
                              for c in self.vel], dt_)
            mask3 = jnp.asarray([0.0 if f else 1.0 for f in free], dt_)
            xu = x0 + vv[None, :] * delta
            vn = jnp.broadcast_to(vv[None, :], state.v.shape)
            return self._apply(state, xu, vn, mask3)
        if self.style == "wiggle":
            free = tuple(c is None for c in self.amp)
            state = self._nve_free(state, free, drift=True)
            arg = self.omega_rotate * delta
            s, c = jnp.sin(arg), jnp.cos(arg)
            aa = jnp.asarray([0.0 if a is None else float(a)
                              for a in self.amp], dt_)
            mask3 = jnp.asarray([0.0 if f else 1.0 for f in free], dt_)
            xu = x0 + aa[None, :] * s
            vn = jnp.broadcast_to(
                (aa * self.omega_rotate * c)[None, :], state.v.shape)
            return self._apply(state, xu, vn, mask3)
        if self.style == "variable":
            from .fixes import _fix_value

            free = tuple(c is None for c in self.dvars)
            state = self._nve_free(state, free, drift=True)
            dvals = [_fix_value(c, state) for c in self.dvars]
            vvals = [_fix_value(c, state) for c in self.vvars]
            mask3 = jnp.asarray([0.0 if f else 1.0 for f in free], dt_)
            dd = jnp.stack([jnp.asarray(0.0 if c is None else c, dt_)
                            for c in dvals])
            vv = jnp.stack([jnp.asarray(0.0 if c is None else c, dt_)
                            for c in vvals])
            xu = x0 + dd[None, :]
            vn = jnp.broadcast_to(vv[None, :], state.v.shape)
            return self._apply(state, xu, vn, mask3)
        # rotate / transrot: all dims prescribed
        arg = self.omega_rotate * delta
        sine, cosine = jnp.sin(arg), jnp.cos(arg)
        import numpy as _np

        runit = _np.asarray(self.axis, dtype=float)
        runit = runit / _np.linalg.norm(runit)
        runit = jnp.asarray(runit, dt_)
        pt = jnp.asarray(self.point, dt_)
        d = x0 - pt[None, :]
        ddotr = jnp.sum(d * runit[None, :], axis=-1, keepdims=True)
        cvec = ddotr * runit[None, :]
        a = d - cvec
        b = jnp.cross(jnp.broadcast_to(runit[None, :], a.shape), a)
        disp = a * cosine + b * sine
        xu = pt[None, :] + cvec + disp
        vn = self.omega_rotate * jnp.cross(
            jnp.broadcast_to(runit[None, :], disp.shape), disp)
        if self.style == "transrot":
            vv = jnp.asarray([0.0 if c is None else float(c)
                              for c in self.vel], dt_)
            xu = xu + vv[None, :] * delta
            vn = vn + vv[None, :]
        mask3 = jnp.ones(3, dt_)
        return self._apply(state, xu, vn, mask3)

    def final_integrate(self, state: State) -> State:
        if self.style == "linear":
            free = tuple(c is None for c in self.vel)
        elif self.style == "wiggle":
            free = tuple(c is None for c in self.amp)
        elif self.style == "variable":
            free = tuple(c is None for c in self.dvars)
        else:
            return state
        if not any(free):
            return state
        return self._nve_free(state, free, drift=False)
