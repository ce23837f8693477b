"""fix python/move: user-supplied Python time integrators.

The reference's PYTHON package lets a fix delegate initial/final_integrate
to a Python class that manipulates atoms through the embedding API (ref:
src/PYTHON/fix_python_move.cpp:85-120 — resolves `module.Class`,
instantiates it with the LAMMPS handle, and forwards the integrate
hooks). Here the same scripts run UNMODIFIED: a shim `lammps` module
hands them our api.py adapter, and the integrate hooks escape the jitted
step through ordered io_callbacks operating on host numpy buffers.
Reference's py_nve.NVE (unittest/force-styles/py_nve.py) is the parity
target via fix-timestep-python_move_nve.yaml.
"""

from __future__ import annotations

import dataclasses
import sys
import types

import numpy as np

import jax
import jax.numpy as jnp

from .verlet import Integrator
from ..core.state import State


class PyMoveAPI:
    """The `lammps` handle seen by the user's fix class: the subset of
    the embedding API that move fixes use (extract_global/extract_atom
    over per-step host buffers; ref: python/lammps/core.py surface)."""

    def __init__(self, dt, units, masses, ntypes):
        self._dt = dt
        self._units = units
        self._masses = np.asarray(masses, dtype=float)
        self._ntypes = ntypes
        self.buf: dict[str, np.ndarray] = {}

    def extract_global(self, name: str):
        vals = {
            "dt": self._dt,
            "ftm2v": self._units.ftm2v,
            "boltz": self._units.boltz,
            "ntypes": self._ntypes,
            "nlocal": int(self.buf.get("nlocal", 0)),
            "respa_dt": None,
        }
        if name not in vals:
            raise KeyError(name)
        return vals[name]

    def extract_atom(self, name: str):
        if name == "mass":
            return self._masses
        return self.buf[name]


def install_lammps_shim():
    """Make `from lammps import lammps` resolve for user fix scripts:
    lammps(ptr=handle) returns the handle (the reference wraps the C
    pointer the same way), a bare call builds our embedding API."""
    if "lammps" in sys.modules:
        return
    mod = types.ModuleType("lammps")

    def lammps(ptr=None, *args, **kwargs):
        if ptr is not None:
            return ptr
        from ..api import lammps as real_lammps

        return real_lammps(*args, **kwargs)

    mod.lammps = lammps
    sys.modules["lammps"] = mod


@dataclasses.dataclass(frozen=True)
class IntegratorPythonMove(Integrator):
    """Time integration delegated to the Python object. nlocal is the
    static owned-atom count (single-chip; the callback slices padding
    off, the python code sees local order = tag order)."""

    pyobj: object = None
    api: object = None
    nlocal: int = 0

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def setup(self, state: State) -> State:
        self.pyobj.init()
        return state

    def _host_initial(self, x, v, f, types):
        n = self.nlocal
        buf = self.api.buf
        buf["nlocal"] = n
        buf["x"] = np.array(x[:n], dtype=float)
        buf["v"] = np.array(v[:n], dtype=float)
        buf["f"] = np.array(f[:n], dtype=float)
        buf["type"] = np.asarray(types[:n])
        self.pyobj.initial_integrate(0)
        xo = np.array(x)
        vo = np.array(v)
        xo[:n] = buf["x"]
        vo[:n] = buf["v"]
        return xo, vo

    def _host_final(self, v, f, types):
        n = self.nlocal
        buf = self.api.buf
        buf["nlocal"] = n
        buf["v"] = np.array(v[:n], dtype=float)
        buf["f"] = np.array(f[:n], dtype=float)
        buf["type"] = np.asarray(types[:n])
        self.pyobj.final_integrate()
        vo = np.array(v)
        vo[:n] = buf["v"]
        return vo

    def initial_integrate(self, state: State) -> State:
        from jax.experimental import io_callback

        x, v = io_callback(
            self._host_initial,
            (jax.ShapeDtypeStruct(state.x.shape, state.x.dtype),
             jax.ShapeDtypeStruct(state.v.shape, state.v.dtype)),
            state.x, state.v, state.f, state.type, ordered=True)
        return state.replace(x=x, v=v)

    def final_integrate(self, state: State) -> State:
        from jax.experimental import io_callback

        v = io_callback(
            self._host_final,
            jax.ShapeDtypeStruct(state.v.shape, state.v.dtype),
            state.v, state.f, state.type, ordered=True)
        return state.replace(v=v)
