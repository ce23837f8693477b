"""Library embedding API: the `lammps` Python class / library.cpp analog.

Mirrors the reference's embedding surface (ref: src/library.cpp — 87
lammps_* functions; python/lammps/core.py ctypes wrapper): open with
command-line-style args, execute script commands, extract global/per-atom
data (zero-copy device views where possible), gather/scatter atoms, query
thermo, box get/reset, version info.
"""

from __future__ import annotations

import jax
import numpy as np

__version__ = 20260816


class lammps:
    """Drop-in-shaped embedding handle (ref: python/lammps/core.py:53).

    >>> lmp = lammps(cmdargs=["-var", "x", "2"])
    >>> lmp.command("units lj")
    >>> lmp.commands_string(deck_text)
    >>> x = lmp.extract_atom("x")         # numpy view of positions
    >>> lmp.get_thermo("temp")
    """

    def __init__(self, name: str = "", cmdargs: list | None = None,
                 dtype=None):
        from .script import LammpsScript

        var_overrides = {}
        log_file = None
        echo = False
        args = list(cmdargs or [])
        i = 0
        while i < len(args):
            a = args[i]
            if a in ("-var", "-v"):
                var_overrides[args[i + 1]] = args[i + 2]
                i += 3
            elif a in ("-log", "-l"):
                log_file = None if args[i + 1] == "none" else args[i + 1]
                i += 2
            elif a in ("-echo", "-e"):
                echo = args[i + 1] in ("screen", "both")
                i += 2
            elif a in ("-in", "-i"):
                self._infile = args[i + 1]
                i += 2
            else:
                i += 1
        self.script = LammpsScript(dtype=dtype, log_file=log_file, echo=echo,
                                   var_overrides=var_overrides)
        if getattr(self, "_infile", None):
            self.script.file(self._infile)

    # -- command execution (ref: lammps_command, library.cpp:570) -----------

    def command(self, cmd: str):
        self.script.one(cmd)

    def commands_list(self, cmds: list[str]):
        for c in cmds:
            self.script.one(c)

    def commands_string(self, text: str):
        for line in text.splitlines():
            self.script.one(line)

    def file(self, path: str):
        self.script.file(path)

    # -- queries (ref: lammps_get_natoms / extract_global / get_thermo) -----

    @property
    def _sim(self):
        if self.script.sim is None:
            self.script._build_simulation()
        return self.script.sim

    def get_natoms(self) -> int:
        return int(jax.device_get(self._sim.state.nlocal))

    def extract_global(self, name: str):
        sim = self._sim
        st = sim.state
        box = st.box
        vals = {
            "natoms": self.get_natoms(),
            "ntimestep": int(jax.device_get(st.ntimestep)),
            "dt": sim.dt,
            "boxlo": np.asarray(jax.device_get(box.lo)),
            "boxhi": np.asarray(jax.device_get(box.hi)),
            "boltz": sim.units.boltz,
            "units": st.units_name,
        }
        if name not in vals:
            raise KeyError(name)
        return vals[name]

    def extract_box(self):
        st = self._sim.state
        lo = np.asarray(jax.device_get(st.box.lo))
        hi = np.asarray(jax.device_get(st.box.hi))
        tilt = np.asarray(jax.device_get(st.box.tilt))
        return (lo.tolist(), hi.tolist(), float(tilt[0]), float(tilt[1]),
                float(tilt[2]), list(st.box.periodic), 0)

    def extract_atom(self, name: str) -> np.ndarray:
        """Per-atom array for owned atoms (ref: lammps_extract_atom,
        library.cpp:1883). Returns a host copy (device arrays are
        immutable); use scatter_atoms to write back."""
        st = self._sim.state
        n = self.get_natoms()
        fields = {
            "x": st.x, "v": st.v, "f": st.f, "type": st.type, "id": st.tag,
            "image": st.image, "q": st.q, "molecule": st.molecule,
            "mask": st.mask,
        }
        arr = fields.get(name)
        if arr is None:
            raise KeyError(name)
        from .core.state import atom_order

        return np.asarray(jax.device_get(arr))[atom_order(st)]

    def get_thermo(self, name: str) -> float:
        row = self._sim.thermo()
        aliases = {"pe": "pe", "ke": "ke", "temp": "temp", "press": "press",
                   "etotal": "etotal", "evdwl": "epair", "epair": "epair",
                   "emol": "emol", "vol": "vol"}
        return float(row[aliases.get(name, name)])

    # -- gather/scatter (ref: lammps_gather_atoms/scatter_atoms,
    #    library.cpp:2477,2961) -------------------------------------------

    def gather_atoms(self, name: str) -> np.ndarray:
        """All atoms in tag order (extract_atom already is)."""
        return self.extract_atom(name)

    def scatter_atoms(self, name: str, data: np.ndarray):
        """Overwrite a per-atom field from tag-ordered data."""
        import jax.numpy as jnp

        from .core.state import atom_order

        sim = self._sim
        st = sim.state
        field = {"x": "x", "v": "v", "f": "f"}.get(name)
        if field is None:
            raise KeyError(name)
        full = np.asarray(jax.device_get(getattr(st, field))).copy()
        full[atom_order(st)] = np.asarray(data)
        sim.state = st.replace(**{field: jnp.asarray(full, dtype=st.dtype)})

    def reset_box(self, boxlo, boxhi, xy=0.0, yz=0.0, xz=0.0):
        import jax.numpy as jnp

        from .core.box import Box

        sim = self._sim
        box = Box.create(boxlo, boxhi, tilt=[xy, xz, yz],
                         periodic=sim.state.box.periodic, dtype=jnp.float64)
        sim.state = sim.state.replace(
            box=jax.tree.map(
                lambda a: jnp.asarray(np.asarray(jax.device_get(a)),
                                      dtype=sim.state.dtype), box)
        )


    # -- computes / fixes / variables (ref: lammps_extract_compute,
    #    lammps_extract_fix, lammps_extract_variable, lammps_set_variable,
    #    library.cpp:1741-2400) ------------------------------------------

    def extract_compute(self, cid: str, style: int = 0, dtype: int = 0):
        """Current value of a defined compute (global scalar/vector; the
        style/type ints of the C API are accepted and inferred)."""
        val = self.script.get_compute(cid)
        arr = np.asarray(jax.device_get(val))
        return float(arr) if arr.ndim == 0 else arr

    def extract_fix(self, fid: str, style: int = 0, dtype: int = 0):
        """Global scalar of fix `fid` (the fix's energy/scalar output,
        matching thermo's f_<id> column)."""
        sim = self._sim
        ids = getattr(self.script, "fix_ids", None)
        for fx in sim.fixes:
            if ids is not None and ids.get(id(fx), None) not in (None, fid):
                continue
            e = getattr(fx, "energy", None)
            if e is not None:
                v = e(sim.state)
                if v is not None:
                    return float(jax.device_get(v))
        raise KeyError(fid)

    def extract_variable(self, name: str, group: str | None = None):
        """Value of an equal-style variable (or the raw string for
        index/string variables)."""
        ev = getattr(self.script, "_equal_vars", {})
        if name in ev:
            return float(self.script._eval_expr(ev[name]))
        sv = getattr(self.script, "variables", {})
        if name in sv:
            return sv[name]
        raise KeyError(name)

    def set_variable(self, name: str, value) -> int:
        """(Re)define a string/index variable (ref: lammps_set_variable)."""
        self.script.one(f"variable {name} string {value}")
        return 0

    def extract_setting(self, name: str) -> int:
        """Integer settings (ref: lammps_extract_setting,
        library.cpp:1320): sizes, dimension, type counts."""
        sim = self._sim
        st = sim.state
        vals = {
            "dimension": st.dimension,
            "world_size": 1, "world_rank": 0,
            "nlocal": self.get_natoms(), "nghost": 0,
            "nall": self.get_natoms(),
            "ntypes": int(np.asarray(jax.device_get(st.type)).max()),
            "molecule_flag": int(st.molecule is not None),
            "q_flag": int(st.q is not None),
        }
        if name not in vals:
            return -1
        return int(vals[name])

    def create_atoms(self, n: int, ids, types, x, v=None) -> int:
        """Append atoms to the current system (ref: lammps_create_atoms,
        library.cpp:2279). Positions/velocities are tag-ordered rows."""
        import jax.numpy as jnp

        sim = self._sim
        st = sim.state
        from .core.state import create_state

        cur_n = self.get_natoms()
        from .core.state import atom_order

        order = atom_order(st)
        xs = np.asarray(jax.device_get(st.x))[order]
        vs = np.asarray(jax.device_get(st.v))[order]
        ts = np.asarray(jax.device_get(st.type))[order]
        tg = np.asarray(jax.device_get(st.tag))[order]
        q_old = (np.asarray(jax.device_get(st.q))[order]
                 if st.q is not None else None)

        x_new = np.concatenate([xs, np.asarray(x, float).reshape(n, 3)])
        v_new = np.concatenate(
            [vs, (np.asarray(v, float).reshape(n, 3) if v is not None
                  else np.zeros((n, 3)))])
        t_new = np.concatenate([ts, np.asarray(types, np.int32)])
        tg_new = np.concatenate(
            [tg, (np.asarray(ids, np.int32) if ids is not None
                  else np.arange(cur_n + 1, cur_n + n + 1, dtype=np.int32))])
        q_new = (np.concatenate([q_old, np.zeros(n)])
                 if q_old is not None else None)
        mass = np.asarray(jax.device_get(st.mass))
        new_state = create_state(
            x_new, st.box, types=t_new, velocities=v_new,
            masses=mass, charges=q_new, tags=tg_new,
            units_name=st.units_name, dtype=st.dtype)
        sim.state = new_state
        sim.nl = None
        sim._segment_cache.clear()
        sim.setup()
        return n

    def last_thermo(self) -> dict:
        """The most recent thermo row (ref: lammps_last_thermo)."""
        return dict(self._sim.thermo())

    def get_thermo_dict(self) -> dict:
        return self.last_thermo()

    def version(self) -> int:
        return __version__

    def close(self):
        self.script = None
