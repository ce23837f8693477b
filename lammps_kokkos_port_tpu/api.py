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
        try:
            self.script.one(cmd)
            self.script._last_error = None
        except Exception as e:
            self.script._last_error = f"{type(e).__name__}: {e}"
            raise

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

    # -- subsets / topology / maps (ref: lammps_gather_atoms_subset,
    #    lammps_scatter_atoms_subset, lammps_gather_bonds,
    #    lammps_map_atom — library.cpp:2680,3065,3150,5110) --------------

    def map_atom(self, tag: int) -> int:
        """Global atom ID -> index into the tag-ordered arrays this API
        returns (the atom-map analog, ref: lammps_map_atom)."""
        st = self._sim.state
        from .core.state import atom_order

        tags = np.asarray(jax.device_get(st.tag))[atom_order(st)]
        idx = np.searchsorted(tags, tag)
        if idx >= len(tags) or tags[idx] != tag:
            return -1
        return int(idx)

    def gather_atoms_subset(self, name: str, ids) -> np.ndarray:
        """Per-atom values for the given atom IDs, in that order."""
        full = self.extract_atom(name)
        st = self._sim.state
        from .core.state import atom_order

        tags = np.asarray(jax.device_get(st.tag))[atom_order(st)]
        pos = np.searchsorted(tags, np.asarray(ids))
        return full[pos]

    def scatter_atoms_subset(self, name: str, ids, data: np.ndarray):
        """Overwrite per-atom values for the given atom IDs."""
        full = self.extract_atom(name)
        st = self._sim.state
        from .core.state import atom_order

        tags = np.asarray(jax.device_get(st.tag))[atom_order(st)]
        pos = np.searchsorted(tags, np.asarray(ids))
        full[pos] = np.asarray(data)
        self.scatter_atoms(name, full)

    def _gather_topology(self, kind: str) -> np.ndarray:
        """[n, 1+arity] rows of (type, atom IDs) for live interactions
        (ref: lammps_gather_bonds/angles/dihedrals/impropers)."""
        top = self._sim.forcefield.topology
        arr = getattr(top, kind, None) if top is not None else None
        if arr is None or arr.shape[0] == 0:
            return np.zeros((0, 0), np.int32)
        a = np.asarray(jax.device_get(arr))
        a = a[a[:, 0] > 0]
        st = self._sim.state
        tags = np.asarray(jax.device_get(st.tag))
        out = a.copy()
        out[:, 1:] = tags[a[:, 1:]]  # local row -> global ID
        return out

    def gather_bonds(self) -> np.ndarray:
        return self._gather_topology("bonds")

    def gather_angles(self) -> np.ndarray:
        return self._gather_topology("angles")

    def gather_dihedrals(self) -> np.ndarray:
        return self._gather_topology("dihedrals")

    def gather_impropers(self) -> np.ndarray:
        return self._gather_topology("impropers")

    # -- neighbor-list introspection (ref: lammps_find_pair_neighlist,
    #    lammps_neighlist_num_elements, lammps_neighlist_element_neighbors
    #    — library.cpp:5208-5356) ----------------------------------------

    def find_pair_neighlist(self, style: str = "", exact: int = 0,
                            nsub: int = 0, reqid: int = 0) -> int:
        """Handle of the pair neighbor list (one list in this engine);
        -1 before setup."""
        sim = self._sim
        if sim.nl is None:
            sim.setup()
        return 0 if sim.nl is not None else -1

    def _analysis_list(self):
        """Flat (i, j) half-pair arrays within the force cutoff on the
        CURRENT configuration (engine-agnostic: built on demand like the
        pair/local compute)."""
        sim = self._sim
        st = sim.state
        from .ops import neighbor as _nbr

        p = _nbr.size_for_system(st, cutneigh=sim.forcefield.max_cutoff(),
                                 skin=0.0)
        nl = _nbr.build(st, p)
        while bool(jax.device_get(nl.overflow)):
            p = _nbr.grow(p)
            nl = _nbr.build(st, p)
        cap = st.capacity
        import jax.numpy as jnp

        jc = jnp.clip(nl.idx, 0, cap - 1)
        dxv = st.box.min_image(st.x[:, None, :] - st.x[jc])
        r2 = jnp.sum(dxv * dxv, axis=-1)
        cut = sim.forcefield.max_cutoff()
        ok = (nl.idx < cap) & (r2 < cut * cut)
        valid = np.asarray(jax.device_get(st.valid_mask))
        ii = np.broadcast_to(np.arange(cap)[:, None], nl.idx.shape)
        okn = (np.asarray(jax.device_get(ok)) & valid[ii]
               & valid[np.asarray(jax.device_get(jc))])
        return ii, np.asarray(jax.device_get(jc)), okn

    def neighlist_num_elements(self, handle: int = 0) -> int:
        """Number of atoms carrying neighbor entries."""
        return self.get_natoms()

    def neighlist_element_neighbors(self, handle: int, element: int):
        """(iatom, neighbors) — neighbors as tag-order indices of the
        element-th atom's in-cutoff partners."""
        st = self._sim.state
        from .core.state import atom_order

        order = atom_order(st)
        row = order[element]
        ii, jc, okn = self._analysis_list()
        js = jc[row][okn[row]]
        inv = np.zeros(st.capacity, np.int64)
        inv[order] = np.arange(len(order))
        return element, inv[js]

    # -- image flags (ref: lammps_encode/decode_image_flags,
    #    library.cpp:4465) ----------------------------------------------

    @staticmethod
    def encode_image_flags(ix: int, iy: int, iz: int):
        return (ix, iy, iz)

    @staticmethod
    def decode_image_flags(image):
        return tuple(int(v) for v in np.asarray(image).reshape(3))

    # -- config / runtime queries (ref: lammps_config_*, lammps_get_os_info,
    #    lammps_memory_usage, library.cpp:4550-4800) ---------------------

    @staticmethod
    def config_has_mpi_support() -> bool:
        return False  # single-process; the device mesh replaces MPI

    @staticmethod
    def config_has_gzip_support() -> bool:
        return True

    @staticmethod
    def config_has_package(name: str) -> bool:
        return name.upper() in ("KOKKOS", "KSPACE", "MANYBODY", "MOLECULE",
                                "RIGID", "ML-SNAP", "GRANULAR", "REPLICA")

    @staticmethod
    def config_package_count() -> int:
        return 8

    @staticmethod
    def config_package_name(idx: int) -> str:
        pkgs = ("KOKKOS", "KSPACE", "MANYBODY", "MOLECULE", "RIGID",
                "ML-SNAP", "GRANULAR", "REPLICA")
        return pkgs[idx] if 0 <= idx < len(pkgs) else ""

    @staticmethod
    def get_os_info() -> str:
        import platform

        return f"{platform.system()} {platform.release()} ({platform.machine()})"

    @staticmethod
    def get_gpu_device_count() -> int:
        return len([d for d in jax.devices() if d.platform != "cpu"])

    def memory_usage(self) -> dict:
        """Approximate resident bytes of the state pytree (ref:
        lammps_memory_usage)."""
        st = self._sim.state
        total = sum(a.size * a.dtype.itemsize
                    for a in jax.tree.leaves(st)
                    if hasattr(a, "size") and hasattr(a, "dtype"))
        return {"device_bytes": int(total)}

    def extract_atom_datatype(self, name: str) -> int:
        """C-API datatype codes: 0 int*, 1 int**, 2 double*, 3 double**."""
        codes = {"x": 3, "v": 3, "f": 3, "q": 2, "type": 0, "id": 0,
                 "mask": 0, "molecule": 0, "image": 1}
        if name not in codes:
            return -1
        return codes[name]

    def extract_global_datatype(self, name: str) -> int:
        codes = {"natoms": 0, "ntimestep": 0, "dt": 2, "boxlo": 3,
                 "boxhi": 3, "boltz": 2, "units": 4}
        return codes.get(name, -1)

    # -- error / run state (ref: lammps_has_error,
    #    lammps_get_last_error_message, lammps_is_running) ---------------

    def has_error(self) -> bool:
        return getattr(self.script, "_last_error", None) is not None

    def get_last_error_message(self) -> str:
        return str(getattr(self.script, "_last_error", "") or "")

    def is_running(self) -> bool:
        return False  # commands are synchronous in this embedding

    def force_timeout(self):
        """Arm the walltime guard so the next run exits promptly (the
        timer timeout analog)."""
        sim = self._sim
        sim._force_timeout = True

    def flush_buffers(self):
        if self.script.log_file:
            pass  # log lines are written eagerly

    def last_thermo(self) -> dict:
        """The most recent thermo row (ref: lammps_last_thermo)."""
        return dict(self._sim.thermo())

    def get_thermo_dict(self) -> dict:
        return self.last_thermo()

    def version(self) -> int:
        return __version__

    def close(self):
        self.script = None
