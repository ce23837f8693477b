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

    def version(self) -> int:
        return __version__

    def close(self):
        self.script = None
