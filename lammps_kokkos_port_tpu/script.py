"""Input-script command language: the reference's L1 layer.

TPU-native equivalent of the reference's Input interpreter
(ref: src/input.cpp:190,367,420,560,749 — line loop, $var substitution,
command dispatch) covering the command set the scoped decks use
(SURVEY.md §A.9). Commands imperatively mutate a ScriptState; `run`
materializes a Simulation (jit-compiled step loop) and executes it,
emitting a reference-style thermo table.

Commands: units, dimension, boundary, atom_style, atom_modify, lattice,
region, create_box, create_atoms, mass, velocity, pair_style, pair_coeff,
pair_modify, bond_style, bond_coeff, angle_style, angle_coeff,
dihedral_style, dihedral_coeff, improper_style, improper_coeff,
special_bonds, kspace_style, kspace_modify, neighbor, neigh_modify, fix,
unfix, timestep, thermo, thermo_style, run, read_data, variable (index /
equal-constants), print, log, echo, group, reset_timestep, write_restart,
read_restart, write_data, dump, undump, replicate, newton, processors,
suffix (accepted no-ops where semantics don't apply on one chip).
"""

from __future__ import annotations

import dataclasses
import re
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .core.box import Box
from .core.lattice import Lattice, create_atoms as lattice_create_atoms
from .core.state import create_state
from .core.topology import build_special, pad_topology
from .core.velocity import create_velocities_geom
from .models import bonded
from .models.forcefield import ForceField
from .utils.units import get_units


class ScriptError(RuntimeError):
    pass


def _is_num(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


def _fmt_num(v) -> str:
    """Number -> shortest exact-ish string for substitution."""
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


@dataclasses.dataclass
class PendingFix:
    fid: str
    group: str
    style: str
    args: list[str]


class LammpsScript:
    """Parse + execute an input script (ref: Input::file/one)."""

    def __init__(self, dtype=None, log_file: str | None = None,
                 echo: bool = False, var_overrides: dict | None = None,
                 list_mode: str = "auto"):
        import jax.numpy as jnp

        self.dtype = dtype if dtype is not None else jnp.float32
        self.list_mode = list_mode
        self.units_name = "lj"
        self.dimension = 3
        self.boundary = ("p", "p", "p")
        self.atom_style = "atomic"
        self.lattice: Lattice | None = None
        self.regions: dict[str, tuple] = {}
        self.box: Box | None = None
        self.ntypes = 0
        self.nbondtypes = 0
        self.nangletypes = 0
        self.ndihedraltypes = 0
        self.nimpropertypes = 0
        self.positions: list = []
        self.types: list = []
        self.charges: list = []
        self.molecules: list = []
        self.images: list = []
        self.velocities: np.ndarray | None = None
        self.sphere_data: dict | None = None
        self.x0_data: np.ndarray | None = None
        self.thermo_norm: bool | None = None
        self.masses: dict[int, float] = {}
        self.pair_style_words: list[str] | None = None
        self.pair_coeffs: list[list[str]] = []
        self.pair_modify: dict = {}
        self.bond_style_name: str | None = None
        self.bond_coeffs: dict = {}
        self.angle_style_name: str | None = None
        self.angle_coeffs: dict = {}
        self.dihedral_style_name: str | None = None
        self.dihedral_coeffs: dict = {}
        self.improper_style_name: str | None = None
        self.improper_coeffs: dict = {}
        self.special = (0.0, 0.0, 0.0)
        self.special_coul = None
        self.kspace_words: list[str] | None = None
        self.kspace_modify: dict = {}
        self.skin: float | None = None
        self.neigh_every = 1
        self.neigh_delay = 0
        self.neigh_check = True
        self.respa = None
        self.fixes: list[PendingFix] = []
        self.dt: float | None = None
        self.thermo_every = 0
        self.ntimestep = 0
        self.variables: dict[str, str] = dict(var_overrides or {})
        self._equal_vars: dict[str, str] = {}
        self._index_vars: dict[str, dict] = {
            k: {"values": [v], "i": 0} for k, v in (var_overrides or {}).items()
        }
        self._jump_skip = False
        self.computes: dict[str, tuple] = {}
        self._msd_x0: dict = {}
        self.thermo_style: list[str] | None = None  # None = default table
        self.groups: dict[str, int] = {"all": 1}
        self._group_defs: dict[str, tuple] = {}
        self.topology_raw: dict = {}
        self.data_masses: np.ndarray | None = None
        self.log_file = log_file
        self.echo = echo
        self.sim = None
        self._log_lines: list[str] = []
        self.dumps: dict[str, dict] = {}
        self.newton = True

    # -- driver --------------------------------------------------------------

    @staticmethod
    def _read_lines(path: str) -> list[str]:
        out = []
        with open(path) as f:
            buf = ""
            for raw in f:
                line = raw.rstrip("\n")
                if line.rstrip().endswith("&"):
                    buf += line.rstrip()[:-1]
                    continue
                buf += line
                out.append(buf)
                buf = ""
            if buf.strip():
                out.append(buf)
        return out

    def file(self, path: str):
        """ref: Input::file — line loop with continuation (&) handling plus
        label/jump/next/if/include control flow (ref: src/input.cpp:749-862
        hardwired commands; jump re-reads the file, here a program counter
        over the cached lines)."""
        import os

        self._last_file_dir = os.path.dirname(os.path.abspath(path))
        self._run_program(self._read_lines(path), path)

    def _run_program(self, lines: list[str], path: str = "SELF"):
        labels = {}
        for i, ln in enumerate(lines):
            w = ln.split("#")[0].split()
            if w[:1] == ["label"] and len(w) > 1:
                labels[w[1]] = i
        pc = 0
        while pc < len(lines):
            line = lines[pc]
            pc += 1
            words = line.split("#")[0].split()
            cmd = words[0] if words else None
            if cmd == "label":
                continue
            if cmd == "jump":
                if self._jump_skip:
                    # an exhausted `next` skips the next jump
                    # (ref: src/variable.cpp next semantics)
                    self._jump_skip = False
                    continue
                target = self._substitute(" ".join(words[1:])).split()
                fname = target[0]
                if fname not in ("SELF", path):
                    lines = self._read_lines(fname)
                    labels = {}
                    for i, ln in enumerate(lines):
                        w = ln.split("#")[0].split()
                        if w[:1] == ["label"] and len(w) > 1:
                            labels[w[1]] = i
                    path = fname
                pc = labels[target[1]] if len(target) > 1 else 0
                continue
            if cmd == "next":
                for name in words[1:]:
                    vals = self._index_vars.get(name)
                    if vals is None:
                        raise ScriptError(f"next on non-index variable {name}")
                    vals["i"] += 1
                    if vals["i"] >= len(vals["values"]):
                        del self._index_vars[name]
                        self.variables.pop(name, None)
                        self._jump_skip = True
                    else:
                        self.variables[name] = vals["values"][vals["i"]]
                continue
            if cmd == "include":
                self._run_program(
                    self._read_lines(self._substitute(words[1])), words[1])
                continue
            self.one(line)

    def cmd_if(self, a):
        """if "cond" then "cmd"... [elif "cond" "cmd"...] [else "cmd"...]
        (ref: src/input.cpp if command; quoted commands are grouped by
        one()'s quote-aware splitter)."""
        i = 0
        while i < len(a):
            if a[i] == "else":
                cond = None
                i += 1
            else:
                cond = a[i]
                i += 1
                if i < len(a) and a[i] == "then":
                    i += 1
            cmds = []
            while i < len(a) and a[i] not in ("elif", "else"):
                cmds.append(a[i])
                i += 1
            if i < len(a) and a[i] == "elif":
                i += 1
            if cond is None or bool(self._eval_expr(cond)):
                for c in cmds:
                    self.one(c)
                return

    def one(self, line: str):
        """ref: Input::one — substitute, parse, dispatch."""
        line = line.split("#")[0]
        line = self._substitute(line)
        head = line.split(None, 1)
        if not head:
            return
        if head[0] in ("if", "print", "variable"):
            import shlex

            words = shlex.split(line)  # quoted sub-commands stay grouped
        else:
            words = line.split()
        if self.echo:
            self._emit("> " + " ".join(words))
        cmd, args = words[0], words[1:]
        handler = getattr(self, f"cmd_{cmd.replace('/', '_')}", None)
        if handler is None:
            raise ScriptError(f"unknown command: {cmd}")
        handler(args)

    def _substitute(self, line: str) -> str:
        """$x, ${name} and $(expr) substitution (ref: Input::substitute;
        equal-style variables evaluate LAZILY at substitution time)."""

        def repl(m):
            name = m.group(1) or m.group(2)
            if name in self._equal_vars:
                return _fmt_num(self._eval_expr(self._equal_vars[name]))
            if name not in self.variables:
                raise ScriptError(f"undefined variable ${name}")
            return str(self.variables[name])

        def subst_immediate(s: str) -> str:
            # $(expr) with balanced parens (ref: Input::substitute $(...))
            out = []
            i = 0
            while i < len(s):
                if s[i] == "$" and i + 1 < len(s) and s[i + 1] == "(":
                    depth = 0
                    j = i + 1
                    while j < len(s):
                        if s[j] == "(":
                            depth += 1
                        elif s[j] == ")":
                            depth -= 1
                            if depth == 0:
                                break
                        j += 1
                    out.append(_fmt_num(self._eval_expr(s[i + 2:j])))
                    i = j + 1
                else:
                    out.append(s[i])
                    i += 1
            return "".join(out)

        prev = None
        while prev != line:
            prev = line
            line = subst_immediate(line)
            line = re.sub(r"\$\{(\w+)\}|\$(\w)", repl, line)
        return line

    def _emit(self, text: str):
        print(text)
        self._log_lines.append(text)
        if self.log_file:
            with open(self.log_file, "a") as f:
                f.write(text + "\n")

    # -- setup commands ------------------------------------------------------

    def cmd_units(self, a):
        self.units_name = a[0]

    def cmd_dimension(self, a):
        self.dimension = int(a[0])

    def cmd_boundary(self, a):
        self.boundary = tuple(a[:3])

    def cmd_atom_style(self, a):
        # hybrid keeps its sub-style list (ref: AtomVecHybrid) — the data
        # reader needs the full column layout
        self.atom_style = " ".join(a) if a[0] == "hybrid" else a[0]

    def cmd_atom_modify(self, a):
        pass  # map/sort hints are automatic here

    def cmd_newton(self, a):
        self.newton = a[0] == "on"  # accepted; full lists make it moot

    def cmd_processors(self, a):
        pass

    def cmd_suffix(self, a):
        pass  # there is only one backend: the TPU path

    def cmd_package(self, a):
        pass

    def cmd_log(self, a):
        self.log_file = None if a[0] == "none" else a[0]

    def cmd_echo(self, a):
        self.echo = a[0] in ("screen", "both")

    def cmd_print(self, a):
        self._emit(" ".join(a).strip('"'))

    def cmd_variable(self, a):
        name, style = a[0], a[1]
        if style == "index":
            if name not in self._index_vars:
                self._index_vars[name] = {"values": list(a[2:]), "i": 0}
                self.variables.setdefault(name, a[2])
        elif style == "loop":
            if name not in self._index_vars:
                n = int(a[2])
                vals = [str(i) for i in range(1, n + 1)]
                self._index_vars[name] = {"values": vals, "i": 0}
                self.variables.setdefault(name, vals[0])
        elif style == "string":
            self.variables.setdefault(name, a[2])
        elif style == "equal":
            # lazy: evaluated at each substitution (thermo keywords are live)
            self._equal_vars[name] = a[2]
        elif style == "atom":
            if not hasattr(self, "_atom_vars"):
                self._atom_vars = {}
            self._atom_vars[name] = a[2]
        elif style == "delete":
            self.variables.pop(name, None)
            self._equal_vars.pop(name, None)
            self._index_vars.pop(name, None)
            if hasattr(self, "_atom_vars"):
                self._atom_vars.pop(name, None)
        else:
            raise ScriptError(f"variable style {style} not supported")

    # thermo keywords usable in equal-style expressions
    # (ref: src/variable.cpp thermo keyword dispatch -> Thermo::evaluate)
    _THERMO_KEYS = ("step", "temp", "press", "pe", "ke", "etotal", "epair",
                    "emol", "vol", "density", "atoms", "lx", "ly", "lz",
                    "dt", "time", "elapsed")

    def _thermo_keyword(self, key: str) -> float:
        if key == "dt":
            from .utils.units import get_units

            return self.dt if self.dt is not None else get_units(
                self.units_name).dt
        if self.sim is None:
            if key == "step":
                return float(self.ntimestep)
            if key == "atoms":
                return float(len(self.positions))
            raise ScriptError(
                f"thermo keyword '{key}' in variable before any run")
        row = self.sim.thermo()
        row["step"] = self.sim.ntimestep
        row["atoms"] = row["natoms"]
        row["elapsed"] = self.sim.ntimestep
        row["time"] = self.sim.ntimestep * (self.dt or 0.0)
        import jax as _jax

        box = self.sim.state.box
        prd = _jax.device_get(box.prd)
        row["lx"], row["ly"], row["lz"] = map(float, prd)
        row["density"] = self._density(row)
        return float(row[key])

    def _density(self, row) -> float:
        import jax as _jax

        masses = self._mass_table()
        types = np.asarray(_jax.device_get(self.sim.state.type))
        valid = np.asarray(_jax.device_get(self.sim.state.valid_mask))
        mtot = float(masses[types[valid]].sum())
        u = get_units(self.units_name)
        return u.mv2d * mtot / row["vol"]

    def _eval_expr(self, expr: str):
        """Equal-style expression engine: arithmetic, comparisons, boolean
        ops, math functions, v_ variables, and thermo keywords (subset of
        ref: src/variable.cpp evaluate)."""
        import math

        s = expr.strip()
        s = re.sub(r"v_(\w+)", lambda m: self._var_value(m.group(1)), s)
        s = s.replace("^", "**").replace("&&", " and ").replace("||", " or ")
        s = re.sub(r"!(?!=)", " not ", s)
        # thermo keywords -> values
        for key in self._THERMO_KEYS:
            if re.search(rf"\b{key}\b", s):
                s = re.sub(rf"\b{key}\b", _fmt_num(self._thermo_keyword(key)),
                           s)
        allowed = {
            "sqrt": math.sqrt, "exp": math.exp, "ln": math.log,
            "log": math.log10, "abs": abs, "sin": math.sin, "cos": math.cos,
            "tan": math.tan, "floor": math.floor, "ceil": math.ceil,
            "round": round, "pow": pow, "PI": math.pi,
            "and": None, "or": None, "not": None,
        }
        if not re.fullmatch(r"[\w\.\+\-\*/%\(\),<>=! \t]+", s):
            raise ScriptError(f"unsupported expression: {expr}")
        for tok in re.findall(r"[A-Za-z_]\w*", s):
            if tok not in allowed and not re.fullmatch(
                    r"\d*[eE]\d+|nan|inf", tok):
                raise ScriptError(f"unknown token '{tok}' in: {expr}")
        ns = {k: v for k, v in allowed.items() if v is not None}
        try:
            out = eval(s, {"__builtins__": {}}, ns)
        except Exception as e:  # noqa: BLE001
            raise ScriptError(f"bad expression: {expr} ({e})") from e
        return float(out) if isinstance(out, bool) else out

    def _var_value(self, name: str) -> str:
        if name in self._equal_vars:
            return "(" + str(self._eval_expr(self._equal_vars[name])) + ")"
        if name in self.variables:
            return str(self.variables[name])
        raise ScriptError(f"undefined variable v_{name}")

    def cmd_lattice(self, a):
        style = a[0]
        if style == "none":
            self.lattice = None
            return
        scale = float(a[1])
        self.lattice = Lattice(
            style=style, scale=scale, units_name=self.units_name,
            dimension=self.dimension,
        )

    def cmd_region(self, a):
        """region styles block/sphere/cylinder/prism with units/side
        keywords (ref: src/region_block.cpp, region_sphere.cpp,
        region_cylinder.cpp, region_prism.cpp)."""
        name, style = a[0], a[1]
        rest = list(a[2:])
        units = "lattice"
        side = "in"
        clean = []
        i = 0
        while i < len(rest):
            if rest[i] == "units":
                units = rest[i + 1]
                i += 2
            elif rest[i] == "side":
                side = rest[i + 1]
                i += 2
            else:
                clean.append(rest[i])
                i += 1

        def num(s):
            if s in ("INF", "EDGE"):
                return None
            return float(s)

        if style == "block":
            params = [num(x) for x in clean[:6]]
        elif style == "sphere":
            params = [float(x) for x in clean[:4]]  # x y z R
        elif style == "cylinder":
            # axis c1 c2 R lo hi
            params = [clean[0]] + [num(x) for x in clean[1:6]]
        elif style == "prism":
            params = [num(x) for x in clean[:9]]  # 6 bounds + xy xz yz
        else:
            raise ScriptError(f"region style {style} not supported yet")
        self.regions[name] = (style, params, units, side)

    def _region_scale(self, units: str) -> np.ndarray:
        if units == "box" or self.lattice is None:
            return np.ones(3)
        return np.asarray(self.lattice.spacing)

    def _region_bbox(self, name: str):
        """(lo, hi) bounding box in box units."""
        style, p, units, _ = self.regions[name]
        sp = self._region_scale(units)
        blo = self._box_lo_np if hasattr(self, "_box_lo_np") else None
        bhi = self._box_hi_np if hasattr(self, "_box_hi_np") else None

        def b(v, d, which):
            if v is not None:
                return v * sp[d]
            return (blo[d] if which == "lo" else bhi[d])

        if style in ("block", "prism"):
            lo = np.array([b(p[0], 0, "lo"), b(p[2], 1, "lo"),
                           b(p[4], 2, "lo")])
            hi = np.array([b(p[1], 0, "hi"), b(p[3], 1, "hi"),
                           b(p[5], 2, "hi")])
            return lo, hi
        if style == "sphere":
            c = np.array(p[:3]) * sp
            r = p[3] * sp[0]
            return c - r, c + r
        if style == "cylinder":
            ax = {"x": 0, "y": 1, "z": 2}[p[0]]
            d1, d2 = [d for d in range(3) if d != ax]
            c1, c2, r = p[1] * sp[d1], p[2] * sp[d2], p[3] * sp[d1]
            lo = np.zeros(3)
            hi = np.zeros(3)
            lo[ax] = b(p[4], ax, "lo")
            hi[ax] = b(p[5], ax, "hi")
            lo[d1], hi[d1] = c1 - r, c1 + r
            lo[d2], hi[d2] = c2 - r, c2 + r
            return lo, hi
        raise ScriptError(style)

    def _region_contains(self, name: str, pts: np.ndarray) -> np.ndarray:
        """Boolean inside-mask for points in box units (ref:
        Region::match; side out inverts)."""
        style, p, units, side = self.regions[name]
        sp = self._region_scale(units)
        if style in ("block", "prism"):
            lo, hi = self._region_bbox(name)
            sel = np.all((pts >= lo) & (pts <= hi), axis=1)
        elif style == "sphere":
            c = np.array(p[:3]) * sp
            r = p[3] * sp[0]
            sel = np.sum((pts - c) ** 2, axis=1) <= r * r
        elif style == "cylinder":
            ax = {"x": 0, "y": 1, "z": 2}[p[0]]
            d1, d2 = [d for d in range(3) if d != ax]
            c1, c2, r = p[1] * sp[d1], p[2] * sp[d2], p[3] * sp[d1]
            lo_ax = (p[4] * sp[ax] if p[4] is not None
                     else self._box_lo_np[ax])
            hi_ax = (p[5] * sp[ax] if p[5] is not None
                     else self._box_hi_np[ax])
            sel = ((pts[:, d1] - c1) ** 2 + (pts[:, d2] - c2) ** 2
                   <= r * r)
            sel &= (pts[:, ax] >= lo_ax) & (pts[:, ax] <= hi_ax)
        else:
            raise ScriptError(style)
        return ~sel if side == "out" else sel

    def _region_match(self, name: str):
        """Static device-side region record for jit fixes
        (ref: Region::match consumers; core/region.py)."""
        from .core.region import RegionMatch

        style, p, units, side = self.regions[name]
        sp = self._region_scale(units)
        if style in ("block", "prism"):
            lo, hi = self._region_bbox(name)
            params = (float(lo[0]), float(hi[0]), float(lo[1]),
                      float(hi[1]), float(lo[2]), float(hi[2]))
            return RegionMatch("block", params, side)
        if style == "sphere":
            return RegionMatch("sphere", (float(p[0] * sp[0]),
                                          float(p[1] * sp[1]),
                                          float(p[2] * sp[2]),
                                          float(p[3] * sp[0])), side)
        if style == "cylinder":
            ax = {"x": 0, "y": 1, "z": 2}[p[0]]
            d1, d2 = [d for d in range(3) if d != ax]
            lo_ax = (p[4] * sp[ax] if p[4] is not None
                     else float(self._box_lo_np[ax]))
            hi_ax = (p[5] * sp[ax] if p[5] is not None
                     else float(self._box_hi_np[ax]))
            return RegionMatch("cylinder", (ax, float(p[1] * sp[d1]),
                                            float(p[2] * sp[d2]),
                                            float(p[3] * sp[d1]),
                                            float(lo_ax), float(hi_ax)),
                               side)
        raise ScriptError(style)

    def _fix_region_kw(self, args):
        if "region" in args:
            return self._region_match(args[list(args).index("region") + 1])
        return None

    def cmd_create_box(self, a):
        self.ntypes = int(a[0])
        style, p, units, _ = self.regions[a[1]]
        if style not in ("block", "prism"):
            raise ScriptError("create_box needs a block or prism region")
        sp = self._region_scale(units)
        lo = np.array([p[0], p[2], p[4]], dtype=float) * sp
        hi = np.array([p[1], p[3], p[5]], dtype=float) * sp
        self._box_tilt = (np.array(p[6:9], dtype=float) * sp
                          if style == "prism" else None)
        # keep exact fp64 bounds on the host: lattice-point inclusion must
        # not depend on the device float width (f32 round-trip would admit
        # duplicate boundary planes)
        self._box_lo_np = lo
        self._box_hi_np = hi
        periodic = tuple(p.startswith("p") for p in self.boundary)
        self.box = Box.create(lo, hi, tilt=getattr(self, "_box_tilt", None),
                              periodic=periodic, dtype=jnp.float64)

    def cmd_create_atoms(self, a):
        type_id = int(a[0])
        if a[1] not in ("box", "region", "single"):
            raise ScriptError("create_atoms: only box/region/single styles")
        if a[1] == "single":
            # create_atoms TYPE single x y z (lattice units by default)
            sp = self._region_scale("lattice")
            pt = np.array([float(a[2]), float(a[3]), float(a[4])]) * sp
            self.positions.append(tuple(pt))
            self.types.append(type_id)
            return
        if a[1] == "box":
            lo = self._box_lo_np
            hi = self._box_hi_np
        else:
            lo, hi = self._region_bbox(a[2])
            lo = np.maximum(lo, self._box_lo_np)
            hi = np.minimum(hi, self._box_hi_np)
        x, t = lattice_create_atoms(self.lattice, lo, hi, type_id=type_id)
        if a[1] == "region" and len(x):
            keep = self._region_contains(a[2], np.asarray(x))
            x, t = np.asarray(x)[keep], np.asarray(t)[keep]
        self.positions.extend(np.asarray(x).tolist())
        self.types.extend(np.asarray(t).tolist())

    def cmd_mass(self, a):
        if a[0] == "*":
            for t in range(1, self.ntypes + 1):
                self.masses[t] = float(a[1])
        else:
            self.masses[int(a[0])] = float(a[1])

    def _atom_expr(self, expr: str) -> np.ndarray:
        """Host-side atom-style variable evaluation over current
        positions: names x/y/z = coordinate columns (ref:
        Variable::compute_atom coordinate keywords)."""
        import ast as _ast

        xs = np.asarray(self.positions)
        env = {"x": xs[:, 0], "y": xs[:, 1], "z": xs[:, 2]}

        def ev(node):
            if isinstance(node, _ast.Expression):
                return ev(node.body)
            if isinstance(node, _ast.Constant):
                return float(node.value)
            if isinstance(node, _ast.Name):
                return env[node.id]
            if isinstance(node, _ast.BinOp):
                a_, b_ = ev(node.left), ev(node.right)
                import operator as op

                return {_ast.Add: op.add, _ast.Sub: op.sub,
                        _ast.Mult: op.mul, _ast.Div: op.truediv,
                        _ast.Pow: op.pow}[type(node.op)](a_, b_)
            if isinstance(node, _ast.UnaryOp):
                v = ev(node.operand)
                return -v if isinstance(node.op, _ast.USub) else v
            raise ScriptError(f"atom expression node {node}")

        return ev(_ast.parse(expr, mode="eval"))

    def cmd_velocity(self, a):
        group, action = a[0], a[1]
        if action == "set":
            # velocity group set vx vy vz [sum yes] — values may be
            # NULL, numbers, or v_<atomvar> (ref: src/velocity.cpp set)
            vals = a[2:5]
            sumv = "sum" in a and a[a.index("sum") + 1] == "yes"
            v = np.asarray(self.velocities, dtype=float)
            n = len(v)
            gm = self._resolve_group_masks(
                np.asarray(self.positions),
                np.asarray(self.types, dtype=np.int32), n, n)
            gbit = self.groups.get(group, 1)
            sel = (gm & gbit) != 0
            for d, s in enumerate(vals):
                if s == "NULL":
                    continue
                if s.startswith("v_"):
                    name = s[2:]
                    expr = self._atom_vars[name] \
                        if hasattr(self, "_atom_vars") else None
                    if expr is None:
                        raise ScriptError(f"velocity set: no var {name}")
                    col = self._atom_expr(self._substitute_vars(expr)
                                          if hasattr(self,
                                                     "_substitute_vars")
                                          else expr)
                else:
                    col = float(s)
                if sumv:
                    v[sel, d] = v[sel, d] + (col[sel]
                                             if np.ndim(col) else col)
                else:
                    v[sel, d] = col[sel] if np.ndim(col) else col
            self.velocities = v.tolist()
            return
        if action != "create":
            raise ScriptError("velocity: only create/set supported")
        t_target = float(a[2])
        seed = int(a[3])
        opts = a[4:]
        dist = "uniform"
        loop = "all"
        i = 0
        while i < len(opts):
            if opts[i] == "dist":
                dist = opts[i + 1]; i += 2
            elif opts[i] == "loop":
                loop = opts[i + 1]; i += 2
            elif opts[i] == "mom":
                i += 2
            elif opts[i] == "rot":
                i += 2
            else:
                i += 1
        x = np.asarray(self.positions)
        types = np.asarray(self.types, dtype=np.int32)
        masses = self._mass_table()
        m_per_atom = masses[types]
        units = get_units(self.units_name)
        if loop == "geom":
            v = create_velocities_geom(
                x, m_per_atom, t_target, seed, units, dist=dist,
                dimension=self.dimension,
            )
        else:
            from .core.velocity import create_velocities_loop_all

            v = create_velocities_loop_all(
                len(x), m_per_atom, t_target, seed, units, dist=dist,
                dimension=self.dimension,
            )
        if group != "all":
            # only group members get (re)initialized (ref: velocity.cpp
            # checks mask[i] & groupbit per atom)
            n = len(x)
            mask = self._resolve_group_masks(x, types, n, n)
            sel = (mask[:n] & self.groups[group]) != 0
            prev = (self.velocities if self.velocities is not None
                    else np.zeros_like(v))
            v = np.where(sel[:, None], v, prev)
        self.velocities = v

    def _mass_table(self) -> np.ndarray:
        if self.data_masses is not None:
            return self.data_masses
        tab = np.ones(self.ntypes + 1)
        for t, m in self.masses.items():
            tab[t] = m
        return tab

    # -- style commands ------------------------------------------------------

    def cmd_pair_style(self, a):
        self.pair_style_words = a

    def cmd_pair_coeff(self, a):
        self.pair_coeffs.append(a)
        # EAM potential files carry the element mass (ref: funcfl/setfl
        # readers set atom->mass); honor it like the reference does
        name = self.pair_style_words[0] if self.pair_style_words else ""
        if name == "eam" and len(a) >= 3:
            from .io.eam_reader import read_funcfl

            t = int(a[0])
            # coeff() OVERRIDES any data-file mass (ref: pair_eam.cpp:406)
            self.masses[t] = read_funcfl(a[2]).mass
        elif name in ("eam/alloy", "eam/fs") and len(a) >= 4:
            from .io.eam_reader import read_setfl

            st = read_setfl(a[2], fs=name.endswith("fs"))
            for t, el in enumerate(a[3:3 + self.ntypes], start=1):
                if el in st.elements:
                    self.masses[t] = float(st.mass[st.elements.index(el)])

    def cmd_run_style(self, a):
        """run_style verlet | respa N n1 [n2...] [bond b] [pair p] ...
        (ref: src/respa.cpp arg parsing; levels are 1-based in input)."""
        if a[0] == "verlet":
            self.respa = None
            return
        if a[0] != "respa":
            raise ScriptError(f"run_style {a[0]} unsupported")
        from .integrate.respa import RespaLevels

        n = int(a[1])
        loops = tuple(int(x) for x in a[2:2 + (n - 1)])
        rest = a[2 + (n - 1):]
        level_of = []
        i = 0
        while i + 1 < len(rest):
            cat = rest[i]
            if cat in ("bond", "angle", "dihedral", "improper", "pair",
                       "kspace"):
                level_of.append((cat, int(rest[i + 1]) - 1))
            i += 2
        self.respa = RespaLevels(nlevels=n, loops=loops,
                                 level_of=tuple(level_of))
        self.sim = None  # force rebuild with the new run style

    def cmd_fix_modify(self, a):
        # recorded only: energy/virial tally toggles are implicit in our
        # design (fix energies flow through AuxFix.energy; virial via the
        # integrator's needs_virial) (ref: src/fix.cpp modify_params)
        self.fix_modify = getattr(self, "fix_modify", {})
        self.fix_modify[a[0]] = tuple(a[1:])

    def cmd_pair_modify(self, a):
        for i in range(0, len(a) - 1, 2):
            self.pair_modify[a[i]] = a[i + 1]

    def cmd_set(self, a):
        """set atom|mol|type RANGE keyword value ...: per-atom property
        assignment before the first run; keywords type/charge/mol with
        LAMMPS n*m range selectors (ref: src/set.cpp command + select)."""
        if self.sim is not None:
            raise ScriptError("set after a run is not supported")
        style, sel = a[0], a[1]
        n = len(self.types)
        types = np.asarray(self.types, dtype=np.int64)
        mols = (np.asarray(self.molecules, dtype=np.int64)
                if self.molecules else np.zeros(n, dtype=np.int64))
        tags = np.arange(1, n + 1)  # positions/types lists are tag-ordered

        def rng_mask(vals, spec):
            if "*" in spec:
                los, _, his = spec.partition("*")
                m = np.ones(len(vals), dtype=bool)
                if los:
                    m &= vals >= int(los)
                if his:
                    m &= vals <= int(his)
                return m
            return vals == int(spec)

        if style == "mol":
            m = rng_mask(mols, sel)
        elif style == "atom":
            m = rng_mask(tags, sel)
        elif style == "type":
            m = rng_mask(types, sel)
        elif style == "region":
            rm = self._region_match(sel)
            m = np.asarray(rm.match(jnp.asarray(
                np.asarray(self.positions, dtype=float))))
        elif style == "group":
            gbit = self.groups.get(sel)
            if gbit is None:
                raise ScriptError(f"set group {sel} undefined")
            masks = self._resolve_group_masks(
                np.asarray(self.positions), types.astype(np.int32),
                n, n)
            m = (masks & gbit) != 0
        else:
            raise ScriptError(f"set style {style} unsupported")
        i = 2
        while i < len(a) - 1:
            kw, val = a[i], a[i + 1]
            if kw == "type":
                types[m] = int(val)
                self.types = types.tolist()
            elif kw == "charge":
                q = (np.asarray(self.charges, dtype=float)
                     if self.charges else np.zeros(n))
                q[m] = float(val)
                self.charges = q.tolist()
            elif kw == "mol":
                mols[m] = int(val)
                self.molecules = mols.tolist()
            else:
                raise ScriptError(f"set keyword {kw} unsupported")
            i += 2

    # the fork registers its RBC styles with slash spellings
    # (BondStyle(wlc/pow/all/visc,...), AngleStyle(area/volume3,...));
    # internally we key on the underscore file names
    _RBC_ALIASES = {"wlc/pow/all/visc": "wlc_pow_all_visc",
                    "area/volume3": "area_volume3"}

    def cmd_bond_style(self, a):
        self.bond_style_name = self._RBC_ALIASES.get(a[0], a[0])

    def cmd_bond_coeff(self, a):
        self._coeff(self.bond_coeffs, a, self.nbondtypes)

    def cmd_angle_style(self, a):
        self.angle_style_name = self._RBC_ALIASES.get(a[0], a[0])

    def cmd_angle_coeff(self, a):
        self._coeff(self.angle_coeffs, a, self.nangletypes)

    def cmd_dihedral_style(self, a):
        self.dihedral_style_name = a[0]

    def cmd_dihedral_coeff(self, a):
        self._coeff(self.dihedral_coeffs, a, self.ndihedraltypes)

    def cmd_improper_style(self, a):
        self.improper_style_name = a[0]

    def cmd_improper_coeff(self, a):
        self._coeff(self.improper_coeffs, a, self.nimpropertypes)

    @staticmethod
    def _coeff(store: dict, a: list[str], ntypes: int):
        vals = tuple(float(x) for x in a[1:])
        if a[0] == "*":
            for t in range(1, ntypes + 1):
                store[t] = vals
        else:
            store[int(a[0])] = vals

    def cmd_special_bonds(self, a):
        if a[0] == "fene":
            self.special = (0.0, 1.0, 1.0)
        elif a[0] == "amber":
            self.special = (0.0, 0.0, 0.5)
            self.special_coul = (0.0, 0.0, 1.0 / 1.2)
        elif a[0] == "charmm":
            self.special = (0.0, 0.0, 0.0)
        elif a[0] == "lj/coul":
            self.special = tuple(float(x) for x in a[1:4])
        elif a[0] == "lj":
            self.special = tuple(float(x) for x in a[1:4])
            # coul may follow
            if "coul" in a:
                ci = a.index("coul")
                self.special_coul = tuple(float(x) for x in a[ci + 1:ci + 4])
        else:
            self.special = tuple(float(x) for x in a[:3])

    def cmd_kspace_style(self, a):
        self.kspace_words = None if a[0] == "none" else a

    def cmd_kspace_modify(self, a):
        for i in range(0, len(a) - 1, 2):
            self.kspace_modify[a[i]] = a[i + 1]

    def cmd_neighbor(self, a):
        self.skin = float(a[0])  # bin style implied

    def cmd_neigh_modify(self, a):
        i = 0
        while i < len(a) - 1:
            k, v = a[i], a[i + 1]
            if k == "every":
                self.neigh_every = int(v)
            elif k == "delay":
                self.neigh_delay = int(v)
            elif k == "check":
                self.neigh_check = v == "yes"
            i += 2

    # -- atom deletion (ref: src/delete_atoms.cpp) --------------------------

    def _sync_from_sim(self):
        """Pull live per-atom state back into the host-side setup lists
        (tag order) and drop the built Simulation, so setup-mutating
        commands after a run see current coordinates. Mirrors the
        read_restart sync path."""
        if self.sim is None:
            return
        import jax as _jax

        from .core.state import atom_order

        st = self.sim.state
        rows = atom_order(st)
        g = _jax.device_get
        self.positions = np.asarray(g(st.x))[rows].tolist()
        self.types = np.asarray(g(st.type))[rows].tolist()
        self.velocities = np.asarray(g(st.v))[rows]
        if st.q is not None and self.charges:
            self.charges = np.asarray(g(st.q))[rows].tolist()
        if self.molecules and getattr(st, "molecule", None) is not None:
            self.molecules = np.asarray(g(st.molecule))[rows].tolist()
        if self.images:
            self.images = np.asarray(g(st.image))[rows].tolist()
        self.ntimestep = getattr(self.sim, "ntimestep", self.ntimestep)
        self.sim = None

    def _filter_atoms(self, keep: np.ndarray):
        """Drop atoms where keep is False; compress IDs to 1..N' and remap
        topology, dropping interactions that reference deleted atoms
        (ref: delete_atoms.cpp bond/compress handling)."""
        keep = np.asarray(keep, dtype=bool)
        idx = np.nonzero(keep)[0]
        remap = np.zeros(len(keep) + 1, dtype=np.int64)
        remap[idx + 1] = np.arange(1, len(idx) + 1)
        self.positions = [tuple(p)
                          for p in np.asarray(self.positions, float)[idx]]
        self.types = [int(t) for t in np.asarray(self.types)[idx]]
        for attr in ("charges", "molecules", "images"):
            v = getattr(self, attr)
            if v:
                arr = np.asarray(v)[idx]
                setattr(self, attr, [r.tolist() if arr.ndim > 1 else
                                     type(v[0])(r) for r in arr])
        if self.velocities is not None:
            self.velocities = np.asarray(self.velocities)[idx]
        if self.x0_data is not None:
            self.x0_data = np.asarray(self.x0_data)[idx]
        if self.sphere_data is not None:
            sd = dict(self.sphere_data)
            for k, v in sd.items():
                if v is not None:
                    sd[k] = np.asarray(v)[idx]
            self.sphere_data = sd
        raw = dict(self.topology_raw)
        for key in ("bonds", "angles", "dihedrals", "impropers"):
            arr = raw.get(key)
            if arr is None:
                continue
            arr = np.asarray(arr)
            if arr.shape[0]:
                ok = np.all(keep[arr[:, 1:] - 1], axis=1)
                arr = arr[ok].copy()
                arr[:, 1:] = remap[arr[:, 1:]]
            raw[key] = arr
        self.topology_raw = raw
        self.sim = None

    def cmd_delete_atoms(self, a):
        """delete_atoms region R | group G | overlap cut G1 G2 | porosity
        R frac seed (ref: src/delete_atoms.cpp; compress-yes ID remap)."""
        self._sync_from_sim()
        x = np.asarray(self.positions, dtype=float)
        n = len(x)
        types = np.asarray(self.types, dtype=np.int64)
        style = a[0]
        if style == "region":
            kill = self._region_contains(a[1], x)
        elif style == "group":
            if a[1] == "all":
                kill = np.ones(n, dtype=bool)
            else:
                gm = self._resolve_group_masks(x, types, n, n)
                kill = (gm[:n] & self.groups[a[1]]) != 0
        elif style == "porosity":
            rname, frac, seed = a[1], float(a[2]), int(a[3])
            inside = self._region_contains(rname, x)
            rng = np.random.default_rng(seed)
            kill = inside & (rng.random(n) < frac)
        elif style == "overlap":
            # delete one atom of each pair closer than cut, first atom in
            # group1 and second in group2 (ref: delete_atoms.cpp overlap)
            cut = float(a[1])
            gm = self._resolve_group_masks(x, types, n, n)
            b1 = 1 if a[2] == "all" else self.groups[a[2]]
            b2 = 1 if a[3] == "all" else self.groups[a[3]]
            in1 = (gm[:n] & b1) != 0
            in2 = (gm[:n] & b2) != 0
            prd = np.asarray(self._box_hi_np) - np.asarray(self._box_lo_np)
            cell = np.maximum(cut, 1e-9)
            nc = np.maximum((prd // cell).astype(int), 1)
            ci = np.floor((x - self._box_lo_np) / prd * nc).astype(int) % nc
            code = (ci[:, 0] * nc[1] + ci[:, 1]) * nc[2] + ci[:, 2]
            buckets: dict[int, list[int]] = {}
            for i_at, c in enumerate(code):
                buckets.setdefault(int(c), []).append(i_at)
            kill = np.zeros(n, dtype=bool)
            offs = [(dx0, dy0, dz0) for dx0 in (-1, 0, 1)
                    for dy0 in (-1, 0, 1) for dz0 in (-1, 0, 1)]
            periodic = [b[0] == "p" for b in self.boundary]
            for i_at in range(n):
                if not in1[i_at] or kill[i_at]:
                    continue
                for dxc, dyc, dzc in offs:
                    cc = (ci[i_at] + np.array([dxc, dyc, dzc])) % nc
                    cde = int((cc[0] * nc[1] + cc[1]) * nc[2] + cc[2])
                    for j_at in buckets.get(cde, ()):
                        if j_at == i_at or not in2[j_at] or kill[j_at]:
                            continue
                        d = x[i_at] - x[j_at]
                        for dd in range(3):
                            if periodic[dd]:
                                d[dd] -= prd[dd] * np.round(d[dd] / prd[dd])
                        if float(d @ d) < cut * cut:
                            kill[i_at] = True
                            break
                    if kill[i_at]:
                        break
        else:
            raise ScriptError(f"delete_atoms style {style} unsupported")
        ndel = int(np.sum(kill))
        self._filter_atoms(~kill)
        self._emit(f"Deleted {ndel} atoms, new total = {n - ndel}")

    def cmd_group(self, a):
        name, style = a[0], a[1]
        if name not in self.groups:
            bit = 1 << len(self.groups)
            self.groups[name] = bit
        self._group_defs[name] = (style, a[2:])

    # -- group selection (ref: src/group.cpp region/type/id/molecule
    # selectors; membership = bits in the per-atom mask, src/group.h:28) ---

    @staticmethod
    def _parse_index_list(args: list[str], values: np.ndarray) -> np.ndarray:
        """LAMMPS-style value selectors: `2 3`, `1:5`, `<= 4`, `<> lo hi`."""
        sel = np.zeros(values.shape[0], dtype=bool)
        i = 0
        while i < len(args):
            w = args[i]
            if w in ("<", "<=", ">", ">=", "=="):
                v = int(args[i + 1])
                op = {"<": np.less, "<=": np.less_equal, ">": np.greater,
                      ">=": np.greater_equal, "==": np.equal}[w]
                sel |= op(values, v)
                i += 2
            elif w == "<>":
                sel |= (values >= int(args[i + 1])) & (values <= int(args[i + 2]))
                i += 3
            elif ":" in w:
                parts = w.split(":")
                lo, hi = int(parts[0]), int(parts[1])
                stride = int(parts[2]) if len(parts) > 2 else 1
                sel |= np.isin(values, np.arange(lo, hi + 1, stride))
                i += 1
            else:
                sel |= values == int(w)
                i += 1
        return sel

    def _resolve_group_masks(self, x: np.ndarray, types: np.ndarray,
                             n: int, cap: int) -> np.ndarray:
        """Per-atom group bitmask: bit 0 = all, one bit per named group."""
        mask = np.zeros(cap, dtype=np.int32)
        mask[:n] = 1
        sels: dict[str, np.ndarray] = {"all": np.ones(n, dtype=bool)}
        for name, (style, args) in self._group_defs.items():
            if style == "type":
                sel = self._parse_index_list(args, types[:n])
            elif style == "id":
                sel = self._parse_index_list(args, np.arange(1, n + 1))
            elif style == "molecule":
                mol = (np.asarray(self.molecules, dtype=np.int64)[:n]
                       if self.molecules else np.zeros(n, dtype=np.int64))
                sel = self._parse_index_list(args, mol)
            elif style == "region":
                sel = self._region_contains(args[0], np.asarray(x[:n]))
            elif style == "union":
                sel = np.zeros(n, dtype=bool)
                for g in args:
                    sel |= sels[g]
            elif style == "intersect":
                sel = np.ones(n, dtype=bool)
                for g in args:
                    sel &= sels[g]
            elif style == "subtract":
                sel = sels[args[0]].copy()
                for g in args[1:]:
                    sel &= ~sels[g]
            else:
                raise ScriptError(f"group style {style} unsupported")
            sels[name] = sel
            mask[:n] |= np.where(sel, self.groups[name], 0).astype(np.int32)
        return mask

    def cmd_fix(self, a):
        self.fixes.append(PendingFix(fid=a[0], group=a[1], style=a[2],
                                     args=a[3:]))

    def cmd_unfix(self, a):
        self.fixes = [f for f in self.fixes if f.fid != a[0]]

    def cmd_change_box(self, a):
        """change_box all triclinic: switch the box to the triclinic code
        path with zero tilts (ref: src/change_box.cpp ortho/triclinic)."""
        if "triclinic" in a:
            self._box_triclinic = True
            if self.box is not None:
                import dataclasses as _dc

                self.box = _dc.replace(self.box, triclinic=True)
        elif "ortho" in a:
            self._box_triclinic = False

    def cmd_timestep(self, a):
        self.dt = float(a[0])

    def cmd_thermo(self, a):
        self.thermo_every = int(a[0])

    # fixed keyword lines of the non-custom styles
    # (ref: src/thermo.cpp:74-85 ONE/MULTI/YAML constants)
    _MULTI_COLS = ["etotal", "ke", "temp", "pe", "ebond", "eangle",
                   "edihed", "eimp", "evdwl", "ecoul", "elong", "press"]
    _YAML_COLS = ["step", "temp", "ke", "pe", "ebond", "eangle", "edihed",
                  "eimp", "evdwl", "ecoul", "elong", "press"]

    def cmd_thermo_style(self, a):
        """thermo_style one|multi|yaml|custom <cols> (ref: src/thermo.cpp
        Thermo::Thermo style selection + format(): `multi` renders
        `Name     = value` fields three per line under a Step/CPU banner,
        `yaml` a `keywords:`/`data:` document)."""
        if a[0] == "one":
            self.thermo_style = None
            self._thermo_lineflag = "one"
            return
        if a[0] == "multi":
            self.thermo_style = list(self._MULTI_COLS)
            self._thermo_lineflag = "multi"
            return
        if a[0] == "yaml":
            self.thermo_style = list(self._YAML_COLS)
            self._thermo_lineflag = "yaml"
            return
        self._thermo_lineflag = "one"
        if a[0] != "custom":
            raise ScriptError(f"thermo_style {a[0]} unsupported")
        cols = []
        for w in a[1:]:
            if w in self._THERMO_COLS or w.startswith(("c_", "v_", "f_")):
                cols.append(w)
            else:
                raise ScriptError(f"thermo_style keyword {w} unsupported")
        self.thermo_style = cols

    def cmd_thermo_modify(self, a):
        for i in range(0, len(a) - 1, 2):
            if a[i] == "norm":
                self.thermo_norm = a[i + 1] == "yes"
                if self.sim is not None:
                    self.sim.thermo_norm = self.thermo_norm

    def cmd_comm_modify(self, a):
        pass  # ghost velocity exchange is implicit (full-state gathers)

    def cmd_reset_timestep(self, a):
        self.ntimestep = int(a[0])

    def cmd_dump(self, a):
        self.dumps[a[0]] = dict(group=a[1], style=a[2], every=int(a[3]),
                                path=a[4], args=a[5:])

    def cmd_undump(self, a):
        self.dumps.pop(a[0], None)

    def cmd_dump_modify(self, a):
        """dump_modify ID sort id|off (ref: src/dump.cpp modify_params;
        other keywords recorded and ignored)."""
        did = a[0]
        d = self.dumps.get(did)
        if d is None:
            return
        i = 1
        while i < len(a) - 1:
            if a[i] == "sort":
                d["sort"] = a[i + 1] != "off"
                i += 2
            else:
                i += 2

    def cmd_read_data(self, a):
        from .io.data_reader import read_data

        df = read_data(a[0], atom_style=self.atom_style)
        self.ntypes = df.natomtypes
        self.nbondtypes = df.nbondtypes
        self.nangletypes = df.nangletypes
        self.ndihedraltypes = df.ndihedraltypes
        self.nimpropertypes = df.nimpropertypes
        periodic = tuple(p.startswith("p") for p in self.boundary)
        tilt = (df.xy, df.xz, df.yz)
        self.box = Box.create(
            [df.xlo, df.ylo, df.zlo], [df.xhi, df.yhi, df.zhi],
            tilt=tilt if any(t != 0 for t in tilt) else None,
            periodic=periodic, dtype=jnp.float64,
        )
        # EDGE resolution for later region commands needs host bounds
        self._box_lo_np = np.array([df.xlo, df.ylo, df.zlo], dtype=float)
        self._box_hi_np = np.array([df.xhi, df.yhi, df.zhi], dtype=float)
        self.positions = df.x.tolist()
        self.data_file_order = df.file_order
        self.types = df.types.tolist()
        if df.q is not None:
            self.charges = df.q.tolist()
        if df.molecule is not None:
            self.molecules = df.molecule.tolist()
        self.images = df.image.tolist()
        self.velocities = df.v
        self.data_masses = df.masses
        # finite-size / dipole per-atom fields (atom styles sphere+dipole)
        self.sphere_data = None
        if df.rmass is not None or df.mu is not None:
            self.sphere_data = {
                "rmass": df.rmass, "radius": df.radius,
                "mu": df.mu, "omega": df.omega,
            }
        # fork x0image styles: the data file CARRIES x0 columns but
        # data_atom_post overwrites them with the read-time positions
        # (ref: atom_vec_full_sph_x0image.cpp:375-377, atom_vec_x0image.cpp
        # same) — the rest configuration is x-at-read, pinned here so a
        # later displace_atoms does not move it
        self.x0_data = df.x.copy() if df.x0 is not None else None
        self.topology_raw = dict(
            bonds=df.bonds, angles=df.angles, dihedrals=df.dihedrals,
            impropers=df.impropers,
        )
        # coeff sections from the data file (ref: read_data.cpp dispatches
        # them to each style's coeff(); later *_coeff commands override)
        for row in df.coeffs.get("Pair Coeffs", []):
            self.pair_coeffs.append([row[0], row[0]] + list(row[1:]))
        for row in df.coeffs.get("PairIJ Coeffs", []):
            self.pair_coeffs.append(list(row))
        for sec, store, nt in (
            ("Bond Coeffs", self.bond_coeffs, self.nbondtypes),
            ("Angle Coeffs", self.angle_coeffs, self.nangletypes),
            ("Dihedral Coeffs", self.dihedral_coeffs, self.ndihedraltypes),
            ("Improper Coeffs", self.improper_coeffs, self.nimpropertypes),
        ):
            for row in df.coeffs.get(sec, []):
                self._coeff(store, list(row), nt)

    def cmd_replicate(self, a):
        nx, ny, nz = int(a[0]), int(a[1]), int(a[2])
        if not self.positions:
            raise ScriptError("replicate before atoms exist")
        x = np.asarray(self.positions)
        t = np.asarray(self.types)
        prd = np.asarray(jax.device_get(self.box.prd))
        reps = []
        tps = []
        for i in range(nx):
            for j in range(ny):
                for k in range(nz):
                    reps.append(x + prd * np.array([i, j, k]))
                    tps.append(t)
        self.positions = np.concatenate(reps).tolist()
        self.types = np.concatenate(tps).tolist()
        lo = np.asarray(jax.device_get(self.box.lo))
        self.box = Box.create(lo, lo + prd * np.array([nx, ny, nz]),
                              periodic=self.box.periodic, dtype=jnp.float64)
        self.velocities = (np.tile(self.velocities, (nx * ny * nz, 1))
                           if self.velocities is not None else None)
        # topology replication (tag offsets) — supported when needed
        if self.topology_raw.get("bonds") is not None and nx * ny * nz > 1:
            raise ScriptError("replicate with topology not yet supported")

    _THERMO_COLS = {
        "step": ("Step", "{:>10d}"), "temp": ("Temp", "{:>14.8g}"),
        "epair": ("E_pair", "{:>14.8g}"), "emol": ("E_mol", "{:>14.8g}"),
        "etotal": ("TotEng", "{:>14.8g}"), "press": ("Press", "{:>14.8g}"),
        "pe": ("PotEng", "{:>14.8g}"), "ke": ("KinEng", "{:>14.8g}"),
        "vol": ("Volume", "{:>14.8g}"), "atoms": ("Atoms", "{:>10d}"),
        "density": ("Density", "{:>14.8g}"), "lx": ("Lx", "{:>12.8g}"),
        "ly": ("Ly", "{:>12.8g}"), "lz": ("Lz", "{:>12.8g}"),
        "cpu": ("CPU", "{:>10.4g}"), "elapsed": ("Elaps", "{:>10d}"),
        "pxx": ("Pxx", "{:>14.8g}"), "pyy": ("Pyy", "{:>14.8g}"),
        "pzz": ("Pzz", "{:>14.8g}"), "pxy": ("Pxy", "{:>14.8g}"),
        "pxz": ("Pxz", "{:>14.8g}"), "pyz": ("Pyz", "{:>14.8g}"),
        "xlo": ("Xlo", "{:>12.8g}"), "xhi": ("Xhi", "{:>12.8g}"),
        "ylo": ("Ylo", "{:>12.8g}"), "yhi": ("Yhi", "{:>12.8g}"),
        "zlo": ("Zlo", "{:>12.8g}"), "zhi": ("Zhi", "{:>12.8g}"),
        "fmax": ("Fmax", "{:>14.8g}"), "fnorm": ("Fnorm", "{:>14.8g}"),
        "enthalpy": ("Enthalpy", "{:>14.8g}"), "dt": ("Dt", "{:>12.6g}"),
        "time": ("Time", "{:>12.8g}"),
        # CPU-rate keywords (ref: src/thermo.cpp compute_spcpu/tpcpu/
        # cpuremain): rates since the previous thermo line of this run
        "spcpu": ("S/CPU", "{:>12.6g}"), "tpcpu": ("T/CPU", "{:>12.6g}"),
        "cpuremain": ("CPULeft", "{:>12.6g}"),
        # per-component energies (ref: src/thermo.cpp compute_ebond etc.)
        "ebond": ("E_bond", "{:>14.8g}"), "eangle": ("E_angle", "{:>14.8g}"),
        "edihed": ("E_dihed", "{:>14.8g}"), "eimp": ("E_impro", "{:>14.8g}"),
        "evdwl": ("E_vdwl", "{:>14.8g}"), "ecoul": ("E_coul", "{:>14.8g}"),
        "elong": ("E_long", "{:>14.8g}"), "etail": ("E_tail", "{:>14.8g}"),
    }

    _ECOMP_KEYS = ("ebond", "eangle", "edihed", "eimp", "evdwl", "ecoul",
                   "elong", "etail")

    def _component_energies(self, sim) -> dict:
        """Per-style energy breakdown for the ebond/.../elong thermo
        keywords (off the hot path: evaluated only when a custom
        thermo_style requests them)."""
        from .models import bonded as bonded_mod

        ff = sim.forcefield
        st, nl = sim.state, sim.nl
        out = dict.fromkeys(self._ECOMP_KEYS, 0.0)
        top = ff.topology
        norm = (self.thermo_norm if self.thermo_norm is not None
                else self.units_name == "lj")
        nloc = float(jax.device_get(st.nlocal)) if norm else 1.0

        def val(e):
            return float(jax.device_get(e)) / (nloc if norm else 1.0)

        if ff.bond is not None and top is not None and top.bonds.shape[0]:
            if hasattr(ff.bond, "compute"):
                _, e, _ = ff.bond.compute(st, top, True, False)
            else:
                _, e, _ = bonded_mod.compute_bonds(ff.bond, st, top, True,
                                                   False)
            out["ebond"] = val(e)
        if ff.angle is not None and top is not None and top.angles.shape[0]:
            if hasattr(ff.angle, "compute"):
                _, e, _ = ff.angle.compute(st, top, True, False)
            else:
                _, e, _ = bonded_mod.compute_angles(ff.angle, st, top, True,
                                                    False)
            out["eangle"] = val(e)
        if (ff.dihedral is not None and top is not None
                and top.dihedrals.shape[0]):
            if hasattr(ff.dihedral, "compute"):
                _, e, _ = ff.dihedral.compute(st, top, True, False)
            else:
                _, e, _, _ = bonded_mod.compute_dihedrals(
                    ff.dihedral, st, top, True, False)
            out["edihed"] = val(e)
        if (ff.improper is not None and top is not None
                and top.impropers.shape[0]):
            _, e, _, _ = bonded_mod.compute_dihedrals(
                ff.improper, st, top, True, False, which="impropers")
            out["eimp"] = val(e)
        if ff.pair is not None:
            slj = (ff.special.weights_lj if ff.special is not None
                   else None)
            scl = (ff.special.weights_coul if ff.special is not None
                   else None)
            if hasattr(ff.pair, "compute_detailed"):
                _, ev, ec, _ = ff.pair.compute_detailed(
                    st, nl, True, False, special_lj=slj, special_coul=scl)
                out["evdwl"] = val(ev)
                out["ecoul"] = val(ec)
            else:
                try:
                    _, e, _ = ff.pair.compute(st, nl, True, False,
                                              special_lj=slj,
                                              special_coul=scl)
                except TypeError:
                    _, e, _ = ff.pair.compute(st, nl, True, False)
                out["evdwl"] = val(e) if e is not None else 0.0
        if ff.kspace is not None:
            _, e, _ = ff.kspace.compute(st, True, False)
            out["elong"] = val(e)
        return out

    def _thermo_columns(self):
        return self.thermo_style or ["step", "temp", "epair", "emol",
                                     "etotal", "press"]

    def _emit_thermo_row(self, sim, step_no, t0):
        import jax as _jax

        row = sim.thermo()
        row["step"] = step_no
        row["atoms"] = row["natoms"]
        row["cpu"] = time.perf_counter() - t0
        row["elapsed"] = step_no
        # CPU-rate keywords relative to the previous thermo line
        # (ref: src/thermo.cpp compute_spcpu/tpcpu/cpuremain)
        prev_step, prev_cpu = getattr(self, "_thermo_prev", (step_no, 0.0))
        d_cpu = row["cpu"] - prev_cpu
        d_step = step_no - prev_step
        spcpu = d_step / d_cpu if d_cpu > 0 and d_step > 0 else 0.0
        row["spcpu"] = spcpu
        row["tpcpu"] = spcpu * self._thermo_keyword("dt")
        end_step = getattr(self, "_run_end", step_no)
        row["cpuremain"] = ((end_step - step_no) / spcpu if spcpu > 0
                            else 0.0)
        self._thermo_prev = (step_no, row["cpu"])
        prd = _jax.device_get(sim.state.box.prd)
        row["lx"], row["ly"], row["lz"] = map(float, prd)
        if "density" in self._thermo_columns():
            row["density"] = self._density(row)
        import math

        if any(c in self._ECOMP_KEYS for c in self._thermo_columns()):
            row.update(self._component_energies(sim))

        parts = []
        vals = []
        for c in self._thermo_columns():
            if c.startswith("c_"):
                row[c] = float(self.get_compute(c[2:]))
                parts.append("{:>14.8g}".format(row[c]))
                vals.append((c, row[c], False))
                continue
            if c.startswith("v_"):
                row[c] = float(self._eval_expr(self._equal_vars[c[2:]]))
                parts.append("{:>14.8g}".format(row[c]))
                vals.append((c, row[c], False))
                continue
            if c.startswith("f_"):
                fxe = next((fx.energy(sim.state) for fx in sim.fixes), None)
                row[c] = float(fxe) if fxe is not None else 0.0
                parts.append("{:>14.8g}".format(row[c]))
                vals.append((c, row[c], False))
                continue
            fmt = self._THERMO_COLS[c][1]
            v = row[c]
            parts.append(fmt.format(int(v) if "d" in fmt else v))
            vals.append((c, v, "d" in fmt))
        lineflag = getattr(self, "_thermo_lineflag", "one")
        if lineflag == "multi":
            # banner + `Name     = value` fields, three per line
            # (ref: src/thermo.cpp FORMAT_MULTI_HEADER + format() MULTILINE)
            lines = ["------------ Step {:>14} ----- CPU = {:>12.7g} (sec) "
                     "-------------".format(step_no, row["cpu"])]
            for i, (c, v, is_int) in enumerate(vals):
                name = (self._THERMO_COLS[c][0]
                        if c in self._THERMO_COLS else c)
                field = ("{:<8} = {:>14d}" if is_int
                         else "{:<8} = {:>14.4f}").format(
                    name, int(v) if is_int else v)
                if i % 3 == 0:
                    lines.append(field)
                else:
                    lines[-1] += " " + field
            self._emit("\n".join(lines))
        elif lineflag == "yaml":
            # (ref: src/thermo.cpp format() YAMLLINE: "  - [v, v, ...]")
            self._emit("  - [" + ", ".join(
                ("{:d}" if is_int else "{:.15g}").format(
                    int(v) if is_int else v)
                for _, v, is_int in vals) + "]")
        else:
            self._emit(" ".join(parts))
        if not all(math.isfinite(v) for v in row.values()
                   if isinstance(v, float)):
            raise ScriptError(f"non-finite thermo at step {step_no}: {row}")
        return row

    def _refresh_local_order(self, sim):
        """Track the reference's local atom order for RNG-stream-exact
        stochastic fixes. Verlet::setup spatially sorts atoms at every run
        (ref: src/verlet.cpp:123, src/atom.cpp:2246); the draw order is
        that bin-sorted sequence, threaded stably run to run."""
        keys = [f.aux_key + "_rank" for f in sim.fixes
                if getattr(f, "needs_local_order", False)]
        if not keys:
            return
        from .utils.localorder import default_skin, ref_sort_order

        st = sim.state
        valid = np.asarray(st.valid_mask)
        tags = np.asarray(st.tag)[valid]
        x = np.asarray(st.x)[valid]
        maxtag = int(tags.max())
        x_by_tag = np.zeros((maxtag, 3))
        x_by_tag[tags - 1] = x
        if getattr(self, "_ref_local_order", None) is None:
            fo = getattr(self, "data_file_order", None)
            self._ref_local_order = (np.asarray(fo, dtype=np.int64)
                                     if fo is not None else np.sort(tags))
        skin = (self.skin if self.skin is not None
                else default_skin(self.units_name))
        binsize = 0.5 * (self._pair_cut_guess() + skin)
        lo = np.asarray(st.box.lo, dtype=float)
        hi = np.asarray(st.box.hi, dtype=float)
        self._ref_local_order = ref_sort_order(
            self._ref_local_order, x_by_tag, lo, hi, binsize)
        cap = int(st.tag.shape[0])
        rank = np.zeros(cap + 1, dtype=np.int32)
        rank[self._ref_local_order] = np.arange(
            len(self._ref_local_order), dtype=np.int32)
        aux = dict(st.aux)
        for k in keys:
            aux[k] = jnp.asarray(rank)
        sim.state = st.replace(aux=aux)

    def cmd_run(self, a):
        """run N [start S stop E] [pre yes/no] [post yes/no]: the Output
        scheduler loop — thermo and every dump fire at their OWN cadence
        (ref: src/output.cpp:339; src/run.cpp arg parsing). `pre yes`
        (default) re-runs the setup force pass — forces recomputed from the
        current state and post_force hooks re-applied, exactly like
        Verlet::setup on consecutive runs (constraint fixes re-solve with
        full-step velocities there)."""
        nsteps = int(a[0])
        start = stop = None
        pre = True
        i = 1
        while i < len(a) - 1:
            if a[i] == "start":
                start = int(a[i + 1])
            elif a[i] == "stop":
                stop = int(a[i + 1])
            elif a[i] == "pre":
                pre = a[i + 1] == "yes"
            i += 2
        fresh = self.sim is None
        sim = self._build_simulation()
        if sim.nl is None:
            sim.setup()
        elif pre and not fresh:
            sim.presetup_forces()
        self._refresh_local_order(sim)
        if "nh_run" in sim.state.aux:
            begin = sim.ntimestep if start is None else start
            end = begin + nsteps if stop is None else stop
            sim.state = sim.state.replace(aux={
                **sim.state.aux,
                "nh_run": jnp.asarray([begin, end], dtype=jnp.int32),
            })
            # re-freeze barostat masses for this segment's window
            # (ref: FixNH::setup runs once per `run` command)
            sim.state = sim.integrator.refresh_segment(sim.state)
            for fx in sim.fixes:
                sim.state = fx.refresh_segment(sim.state)
        lineflag = getattr(self, "_thermo_lineflag", "one")
        if lineflag == "yaml":
            # (ref: src/thermo.cpp Thermo::header YAMLLINE branch)
            self._emit("---\nkeywords: [" + ", ".join(
                f"'{self._THERMO_COLS[c][0] if c in self._THERMO_COLS else c}'"
                for c in self._thermo_columns()) + "]\ndata:")
        elif lineflag != "multi":  # multi prints no column header
            self._emit(" ".join(
                (self._THERMO_COLS[c][0] if c in self._THERMO_COLS else c)
                for c in self._thermo_columns()))
        t0 = time.perf_counter()
        self._thermo_prev = (sim.ntimestep, 0.0)
        self._run_end = sim.ntimestep + nsteps
        rows = [self._emit_thermo_row(sim, sim.ntimestep, t0)]
        self._write_dumps(sim.ntimestep)
        restart_every = (getattr(self, "_restart_sched", None) or
                         {}).get("every", 0)

        done = 0
        while done < nsteps:
            nxt = nsteps
            if self.thermo_every > 0:
                nxt = min(nxt, ((done // self.thermo_every) + 1)
                          * self.thermo_every)
            for d in self.dumps.values():
                if d["every"] > 0:
                    nxt = min(nxt, ((done // d["every"]) + 1) * d["every"])
            if restart_every > 0:
                nxt = min(nxt, ((done // restart_every) + 1) * restart_every)
            seg = nxt - done
            sim._run_segment_retry(seg)
            sim.ntimestep += seg
            done = nxt
            step_no = sim.ntimestep
            if done == nsteps or (self.thermo_every > 0
                                  and done % self.thermo_every == 0):
                rows.append(self._emit_thermo_row(sim, step_no, t0))
            self._write_dumps(step_no)
            self._write_scheduled_restart(sim, step_no)

        sim.state.x.block_until_ready()
        loop = time.perf_counter() - t0
        sim.last_loop_time = loop
        n = rows[-1]["natoms"]
        rate = nsteps / loop if loop > 0 else float("inf")
        self._emit(
            f"Loop time of {loop:.6g} on 1 procs for {nsteps} steps with "
            f"{n} atoms"
        )
        self._emit(
            f"Performance: {rate:.3f} timesteps/s, "
            f"{n * nsteps / max(loop, 1e-9) / 1e6:.3f} Matom-step/s"
        )
        # Finish-style breakdown (ref: src/finish.cpp:127-460): the step is
        # one fused kernel, so report the list-rebuild statistics instead
        # of per-section wall time
        import jax as _jax

        nb = int(_jax.device_get(sim.nl.nbuilds))
        nd = int(_jax.device_get(sim.nl.ndanger))
        self._emit(f"Neighbor list builds = {nb}  Dangerous builds = {nd}")
        self.ntimestep = sim.ntimestep
        return rows

    def cmd_compute(self, a):
        """compute ID group style [args] (ref: src/modify.cpp add_compute;
        supported styles: temp, pressure, pe, ke, msd, com, rdf, ke/atom,
        pe/atom — evaluated on demand via get_compute)."""
        cid, group, style = a[0], a[1], a[2]
        known = ("temp", "pressure", "pe", "ke", "msd", "com", "rdf",
                 "ke/atom", "pe/atom", "stress/atom", "chunk/atom",
                 "com/chunk", "erotate/sphere", "gyration",
                 "displace/atom", "vacf", "temp/com", "coord/atom",
                 "property/atom", "reduce", "dipole", "angmom",
                 "cluster/atom", "centro/atom", "cna/atom",
                 "pair/local", "bond/local", "inertia/chunk",
                 "angle/local", "dihedral/local", "property/local",
                 "temp/partial", "temp/region", "vcm/chunk",
                 "gyration/chunk", "angmom/chunk", "heat/flux",
                 "count/type", "slice")
        if style not in known:
            raise ScriptError(f"compute style {style} unsupported")
        self.computes[cid] = (group, style, a[3:])
        # reference-origin computes snapshot their baseline at DEFINITION
        # (ref: compute_msd.cpp/compute_displace_atom.cpp store x0 in ctor)
        if style in ("msd", "displace/atom", "vacf") and self.sim is not None:
            from .compute import observables as obs

            st = self.sim.state
            if style == "vacf":
                self._msd_x0[cid + "/v0"] = st.v
            else:
                self._msd_x0[cid] = obs.unwrapped(st)

    def cmd_uncompute(self, a):
        self.computes.pop(a[0], None)

    def get_compute(self, cid: str):
        """Evaluate a declared compute (host API, the analog of
        lammps_extract_compute, ref: src/library.cpp:2049)."""
        from .compute import observables as obs
        from .compute import thermo as thermo_mod

        group, style, args = self.computes[cid]
        sim = self._build_simulation()
        if sim.nl is None:
            sim.setup()
        gbit = self.groups.get(group, 1)
        st = sim.state
        u = sim.units
        if style == "temp":
            return float(thermo_mod.temperature(st, u,
                                                sim.total_extra_dof()))
        if style == "pressure":
            row = sim.thermo()
            return row["press"]
        if style == "pe":
            row = sim.thermo()
            return row["pe"] * (row["natoms"] if u.norm_default else 1.0)
        if style == "ke":
            row = sim.thermo()
            return row["ke"] * (row["natoms"] if u.norm_default else 1.0)
        if style == "erotate/sphere":
            # 0.5 * sum I w^2, I = 2/5 m r^2
            # (ref: src/compute_erotate_sphere.cpp)
            import jax.numpy as _jnp

            g = st.valid_mask & st.group_mask(gbit)
            rad = st.aux["radius"]
            om = st.aux["omega"]
            inertia = 0.4 * st.per_atom_mass * rad * rad
            ke = 0.5 * _jnp.sum(_jnp.where(
                g, inertia * _jnp.sum(om * om, axis=-1), 0.0))
            return float(ke) * u.mvv2e
        if style == "msd":
            x0 = self._msd_x0.setdefault(cid, obs.unwrapped(st))
            return np.asarray(obs.msd(st, x0, groupbit=gbit))
        if style == "gyration":
            # Rg = sqrt(sum m |x-com|^2 / M), unwrapped coordinates
            # (ref: src/compute_gyration.cpp)
            import jax.numpy as _jnp

            g = st.valid_mask & st.group_mask(gbit)
            xu = obs.unwrapped(st)
            m = _jnp.where(g, st.per_atom_mass, 0.0)
            M = _jnp.sum(m)
            c = _jnp.sum(m[:, None] * xu, axis=0) / M
            rg2 = _jnp.sum(m * _jnp.sum((xu - c) ** 2, axis=-1)) / M
            return float(_jnp.sqrt(rg2))
        if style == "displace/atom":
            # per-atom displacement since the compute was defined
            # (ref: src/compute_displace_atom.cpp)
            x0 = self._msd_x0.setdefault(cid, obs.unwrapped(st))
            d = np.asarray(obs.unwrapped(st) - x0)
            return np.concatenate(
                [d, np.linalg.norm(d, axis=-1, keepdims=True)], axis=-1)
        if style == "vacf":
            # <v(0).v(t)> components + total (ref: src/compute_vacf.cpp)
            import jax.numpy as _jnp

            v0 = self._msd_x0.setdefault(cid + "/v0", st.v)
            g = st.valid_mask & st.group_mask(gbit)
            n = _jnp.maximum(_jnp.sum(g), 1)
            comp = _jnp.sum(_jnp.where(g[:, None], st.v * v0, 0.0),
                            axis=0) / n
            return np.concatenate([np.asarray(comp),
                                   [float(comp.sum())]])
        if style == "temp/com":
            # temperature with the group COM velocity removed
            # (ref: src/compute_temp_com.cpp)
            import jax.numpy as _jnp

            g = st.valid_mask & st.group_mask(gbit)
            m = _jnp.where(g, st.per_atom_mass, 0.0)
            M = _jnp.maximum(_jnp.sum(m), 1e-300)
            vcom = _jnp.sum(m[:, None] * st.v, axis=0) / M
            dv = st.v - vcom
            ke2 = _jnp.sum(_jnp.where(g, st.per_atom_mass
                                      * _jnp.sum(dv * dv, axis=-1), 0.0))
            dof = 3.0 * float(_jnp.sum(g)) - 3.0
            return float(ke2 * u.mvv2e / (dof * u.boltz))
        if style == "coord/atom":
            # neighbor count within cutoff (ref:
            # src/compute_coord_atom.cpp cutoff style)
            import jax.numpy as _jnp

            from .ops import neighbor as _nbr

            rc = float(args[1]) if len(args) > 1 else float(args[0])
            p = _nbr.size_for_system(st, cutneigh=rc, skin=0.0)
            nl2 = _nbr.build(st, p)
            while bool(nl2.overflow):
                p = _nbr.grow(p)
                nl2 = _nbr.build(st, p)
            jc = _jnp.clip(nl2.idx, 0, st.capacity - 1)
            dx = st.box.min_image(st.x[:, None, :] - st.x[jc])
            r2 = _jnp.sum(dx * dx, axis=-1)
            ok = (nl2.idx < st.capacity) & (r2 < rc * rc)
            return np.asarray(_jnp.sum(ok, axis=-1))[
                np.asarray(st.valid_mask)]
        if style == "temp/partial":
            # KE over the enabled velocity components
            # (ref: src/compute_temp_partial.cpp)
            import jax.numpy as _jnp

            flags = np.array([int(args[0]), int(args[1]), int(args[2])])
            g = st.valid_mask & st.group_mask(gbit)
            vsel = st.v * _jnp.asarray(flags, st.dtype)
            ke2 = _jnp.sum(_jnp.where(
                g, st.per_atom_mass * _jnp.sum(vsel * vsel, axis=-1), 0.0))
            nfl = int(flags.sum())
            dof = nfl * float(_jnp.sum(g)) - nfl
            return float(ke2 * u.mvv2e / max(dof, 1.0) / u.boltz)
        if style == "temp/region":
            # temperature of atoms currently inside a region
            # (ref: src/compute_temp_region.cpp — dof = dim * count)
            import jax.numpy as _jnp

            inside = np.zeros(st.capacity, bool)
            valid = np.asarray(st.valid_mask)
            xs = np.asarray(jax.device_get(st.x))
            inside[valid] = self._region_contains(args[0], xs[valid])
            g = st.valid_mask & st.group_mask(gbit) & _jnp.asarray(inside)
            ke2 = _jnp.sum(_jnp.where(
                g, st.per_atom_mass * _jnp.sum(st.v * st.v, axis=-1), 0.0))
            dof = 3.0 * float(_jnp.sum(g))
            return float(ke2 * u.mvv2e / max(dof, 1.0) / u.boltz)
        if style == "count/type":
            # per-type atom counts in the group
            # (ref: src/compute_count_type.cpp)
            g = np.asarray(st.valid_mask & st.group_mask(gbit))
            t = np.asarray(st.type)[g]
            return np.bincount(t, minlength=self.ntypes + 1)[1:]
        if style in ("vcm/chunk", "gyration/chunk", "angmom/chunk"):
            return self._compute_chunk_extra(style, st, sim, gbit)
        if style == "heat/flux":
            return self._compute_heat_flux(st, sim, gbit, args)
        if style == "slice":
            # rows [start:stop:skip] (1-based inclusive) of another
            # compute's vector/array (ref: src/compute_slice.cpp)
            start, stop, skip = int(args[0]), int(args[1]), int(args[2])
            ref = args[3]
            src = np.atleast_1d(np.asarray(
                self.get_compute(ref[2:] if ref.startswith("c_") else ref)))
            return src[start - 1:stop:skip]
        if style in ("cluster/atom", "centro/atom", "cna/atom"):
            return self._compute_structure_atom(style, st, sim, gbit, args)
        if style in ("angle/local", "dihedral/local"):
            return self._compute_topo_local(style, st, sim, args)
        if style == "property/local":
            return self._compute_property_local(st, sim, args)
        if style == "pair/local":
            return self._compute_pair_local(st, sim, gbit, args)
        if style == "bond/local":
            return self._compute_bond_local(st, sim, gbit, args)
        if style == "inertia/chunk":
            # per-molecule inertia tensor about the chunk COM
            # (ref: src/compute_inertia_chunk.cpp, molecule chunks)
            import jax.numpy as _jnp

            g = st.valid_mask
            m = _jnp.where(g, st.per_atom_mass, 0.0)
            chunk = _jnp.where(g, st.molecule - 1, -1)
            nmol = int(max(self.molecules)) if self.molecules else 1
            from .compute import observables as obs

            xu = obs.unwrapped(st)
            ok = chunk >= 0
            idx = _jnp.where(ok, chunk, 0)
            mw = _jnp.where(ok, m, 0.0)
            mc = _jnp.zeros(nmol, st.dtype).at[idx].add(mw, mode="drop")
            com = _jnp.zeros((nmol, 3), st.dtype).at[idx].add(
                mw[:, None] * xu, mode="drop") / _jnp.maximum(
                mc, 1e-300)[:, None]
            d = xu - com[idx]
            r2c = _jnp.sum(d * d, axis=-1)
            comps = _jnp.stack([
                r2c - d[:, 0] * d[:, 0],   # Ixx = m (y^2+z^2)
                r2c - d[:, 1] * d[:, 1],   # Iyy
                r2c - d[:, 2] * d[:, 2],   # Izz
                -d[:, 0] * d[:, 1],        # Ixy
                -d[:, 1] * d[:, 2],        # Iyz
                -d[:, 0] * d[:, 2],        # Ixz
            ], axis=-1)
            out = _jnp.zeros((nmol, 6), st.dtype).at[idx].add(
                mw[:, None] * comps, mode="drop")
            return np.asarray(out)
        if style == "property/atom":
            # per-atom fields by name (ref: src/compute_property_atom.cpp)
            valid = np.asarray(st.valid_mask)
            cols = []
            fieldmap = {
                "id": lambda: np.asarray(st.tag),
                "type": lambda: np.asarray(st.type),
                "mass": lambda: np.asarray(st.per_atom_mass),
                "q": lambda: np.asarray(st.q) if st.q is not None
                else np.zeros(st.capacity),
                "x": lambda: np.asarray(st.x[:, 0]),
                "y": lambda: np.asarray(st.x[:, 1]),
                "z": lambda: np.asarray(st.x[:, 2]),
                "vx": lambda: np.asarray(st.v[:, 0]),
                "vy": lambda: np.asarray(st.v[:, 1]),
                "vz": lambda: np.asarray(st.v[:, 2]),
                "fx": lambda: np.asarray(st.f[:, 0]),
                "fy": lambda: np.asarray(st.f[:, 1]),
                "fz": lambda: np.asarray(st.f[:, 2]),
                "mol": lambda: np.asarray(st.molecule)
                if st.molecule is not None else np.zeros(st.capacity),
            }
            for w in args:
                if w not in fieldmap:
                    raise ScriptError(f"property/atom field {w}")
                cols.append(fieldmap[w]()[valid])
            out = np.stack(cols, axis=-1)
            return out[:, 0] if out.shape[1] == 1 else out
        if style == "reduce":
            # reduce sum|min|max|ave over per-atom inputs: x/y/z, vx..,
            # fx.., or c_ID[/col] (ref: src/compute_reduce.cpp)
            mode = args[0]
            vals = []
            valid = np.asarray(st.valid_mask
                               & np.asarray(st.group_mask(gbit)))
            for w in args[1:]:
                if w.startswith("c_"):
                    ref = w[2:]
                    col = None
                    if "[" in ref:
                        ref, rest = ref.split("[")
                        col = int(rest.rstrip("]")) - 1
                    arr = np.asarray(self.get_compute(ref))
                    if arr.ndim == 2 and col is not None:
                        arr = arr[:, col]
                    if arr.shape[0] == int(valid.sum()):
                        vals.append(arr)
                    else:
                        vals.append(arr[valid])
                else:
                    comp = {"x": ("x", 0), "y": ("x", 1), "z": ("x", 2),
                            "vx": ("v", 0), "vy": ("v", 1), "vz": ("v", 2),
                            "fx": ("f", 0), "fy": ("f", 1),
                            "fz": ("f", 2)}[w]
                    vals.append(np.asarray(
                        getattr(st, comp[0]))[valid][:, comp[1]])
            red = {"sum": np.sum, "min": np.min, "max": np.max,
                   "ave": np.mean}[mode]
            out = [float(red(v)) for v in vals]
            return out[0] if len(out) == 1 else np.asarray(out)
        if style == "dipole":
            # group dipole moment magnitude + vector about the group
            # charge-weighted... reference uses COM (compute_dipole.cpp)
            import jax.numpy as _jnp

            g = st.valid_mask & st.group_mask(gbit)
            q = st.q if st.q is not None else _jnp.zeros(st.capacity)
            xu = obs.unwrapped(st)
            m = _jnp.where(g, st.per_atom_mass, 0.0)
            c = _jnp.sum(m[:, None] * xu, axis=0) / _jnp.maximum(
                _jnp.sum(m), 1e-300)
            mu = _jnp.sum(_jnp.where(g[:, None], q[:, None] * (xu - c),
                                     0.0), axis=0)
            return np.concatenate([np.asarray(mu),
                                   [float(_jnp.linalg.norm(mu))]])
        if style == "angmom":
            # group angular momentum about its COM
            # (ref: src/compute_angmom_chunk.cpp group analog)
            import jax.numpy as _jnp

            g = st.valid_mask & st.group_mask(gbit)
            xu = obs.unwrapped(st)
            m = _jnp.where(g, st.per_atom_mass, 0.0)
            c = _jnp.sum(m[:, None] * xu, axis=0) / _jnp.maximum(
                _jnp.sum(m), 1e-300)
            L = _jnp.sum(_jnp.where(
                g[:, None], m[:, None] * _jnp.cross(xu - c, st.v), 0.0),
                axis=0)
            return np.asarray(L)
        if style == "com":
            return np.asarray(obs.com(st, groupbit=gbit))
        if style == "rdf":
            nbins = int(args[0]) if args else 50
            return obs.rdf(st, nbins=nbins)
        if style == "ke/atom":
            return np.asarray(obs.ke_atom(st))
        if style == "pe/atom":
            return np.asarray(obs.pe_atom(sim, groupbit=gbit))
        if style == "stress/atom":
            return np.asarray(obs.stress_atom(sim))
        if style == "chunk/atom":
            # molecule-ID chunks (the only binning wired; ref:
            # src/compute_chunk_atom.cpp molecule style)
            return np.asarray(sim.state.molecule)
        if style == "com/chunk":
            import jax.numpy as _jnp

            st = sim.state
            g = st.valid_mask
            m = _jnp.where(g, st.per_atom_mass, 0.0)
            chunk = _jnp.where(g, st.molecule - 1, -1)
            nmol = int(max(self.molecules))
            prd = st.box.prd.astype(st.dtype)
            xu = st.x + st.image.astype(st.dtype) * prd
            ok = chunk >= 0
            idx = _jnp.where(ok, chunk, 0)
            mc = _jnp.zeros(nmol, st.dtype).at[idx].add(
                _jnp.where(ok, m, 0.0), mode="drop")
            com = _jnp.zeros((nmol, 3), st.dtype).at[idx].add(
                _jnp.where(ok[:, None], m[:, None] * xu, 0.0),
                mode="drop")
            return np.asarray(com / np.maximum(np.asarray(mc)[:, None],
                                               1e-300))
        raise ScriptError(style)

    # -- structural per-atom computes (host-side analysis) ------------------

    def _host_adjacency(self, st, rc: float):
        """Symmetrized (i, j, dx) pair arrays within cutoff rc among valid
        atoms, minimum-image. Host-side numpy; analysis computes only."""
        import jax.numpy as _jnp

        from .ops import neighbor as _nbr

        p = _nbr.size_for_system(st, cutneigh=rc, skin=0.0)
        nl2 = _nbr.build(st, p)
        while bool(nl2.overflow):
            p = _nbr.grow(p)
            nl2 = _nbr.build(st, p)
        cap = st.capacity
        jc = _jnp.clip(nl2.idx, 0, cap - 1)
        dx = st.box.min_image(st.x[:, None, :] - st.x[jc])
        r2 = _jnp.sum(dx * dx, axis=-1)
        ok = (nl2.idx < cap) & (r2 < rc * rc)
        valid = np.asarray(st.valid_mask)
        ii = np.broadcast_to(np.arange(cap)[:, None], nl2.idx.shape)
        okn = np.asarray(ok) & valid[ii] & valid[np.asarray(jc)]
        i_idx = ii[okn]
        j_idx = np.asarray(jc)[okn]
        return i_idx, j_idx, np.asarray(dx)[okn]

    def _compute_structure_atom(self, style, st, sim, gbit, args):
        """cluster/atom, centro/atom, cna/atom (ref:
        src/compute_cluster_atom.cpp, src/compute_centro_atom.cpp,
        src/compute_cna_atom.cpp). Host-side numpy analysis on the
        symmetrized adjacency; output per valid atom."""
        valid = np.asarray(st.valid_mask)
        group = np.asarray(st.group_mask(gbit)) & valid
        tags = np.asarray(st.tag)
        cap = st.capacity

        if style == "cluster/atom":
            # connected components within cutoff among GROUP atoms;
            # clusterID = smallest atom ID in the cluster, 0 outside group
            # (ref: compute_cluster_atom.cpp iterative ID sweep)
            rc = float(args[0])
            i_idx, j_idx, _ = self._host_adjacency(st, rc)
            keep = group[i_idx] & group[j_idx]
            i_idx, j_idx = i_idx[keep], j_idx[keep]
            parent = np.arange(cap)

            def find(a):
                while parent[a] != a:
                    parent[a] = parent[parent[a]]
                    a = parent[a]
                return a

            for a, b in zip(i_idx, j_idx):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[rb] = ra
            roots = np.fromiter((find(a) for a in range(cap)), dtype=np.int64,
                                count=cap)
            # min tag per root
            minid = np.full(cap, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(minid, roots[group], tags[group])
            out = np.where(group, minid[roots], 0)
            return out[valid].astype(np.float64)

        if style == "centro/atom":
            # centrosymmetry: sum of the nnn/2 smallest |Ri+Rj|^2 over the
            # nnn nearest neighbors (ref: compute_centro_atom.cpp)
            lat = args[0] if args else "fcc"
            nnn = {"fcc": 12, "bcc": 8}.get(lat, None)
            if nnn is None:
                nnn = int(lat)
            rc = sim.forcefield.max_cutoff()
            i_idx, j_idx, dxp = self._host_adjacency(st, rc)
            out = np.zeros(cap)
            order = np.argsort(i_idx, kind="stable")
            i_s, dx_s = i_idx[order], dxp[order]
            starts = np.searchsorted(i_s, np.arange(cap))
            ends = np.searchsorted(i_s, np.arange(cap) + 1)
            half = nnn // 2
            for a in np.nonzero(group)[0]:
                vecs = dx_s[starts[a]:ends[a]]  # dx = x_i - x_j; R_j = -dx
                if vecs.shape[0] < nnn:
                    continue  # ref: fewer than nnn neighbors -> 0.0
                r2v = np.sum(vecs * vecs, axis=1)
                sel = vecs[np.argsort(r2v)[:nnn]]
                s = sel[:, None, :] + sel[None, :, :]  # Ri + Rj
                d2 = np.sum(s * s, axis=-1)
                iu = np.triu_indices(nnn, k=1)
                vals = np.sort(d2[iu])[:half]
                out[a] = float(np.sum(vals))
            return out[valid]

        # cna/atom: common neighbor analysis pattern per atom
        # (ref: compute_cna_atom.cpp; 1 fcc, 2 hcp, 3 bcc, 4 icos, 5 other)
        rc = float(args[0])
        i_idx, j_idx, _ = self._host_adjacency(st, rc)
        adj = [set() for _ in range(cap)]
        for a, b in zip(i_idx, j_idx):
            adj[a].add(int(b))
        out = np.zeros(cap)
        UNKNOWN, FCC, HCP, BCC, ICOS, OTHER = 0, 1, 2, 3, 4, 5
        for a in np.nonzero(group)[0]:
            neigh = sorted(adj[a])
            n = len(neigh)
            if n not in (12, 14):
                out[a] = OTHER
                continue
            # signature per near neighbor: (ncommon, nbonds, maxbond,
            # minbond) where maxbond/minbond are the extreme per-common-
            # neighbor bond counts (ref: compute_cna_atom.cpp:264-301)
            sigs = []
            for b in neigh:
                common = adj[a] & adj[b]
                ncom = len(common)
                nb = 0
                deg = {c: 0 for c in common}
                cl = sorted(common)
                for u in range(len(cl)):
                    for v in range(u + 1, len(cl)):
                        if cl[v] in adj[cl[u]]:
                            nb += 1
                            deg[cl[u]] += 1
                            deg[cl[v]] += 1
                maxb = max(deg.values()) if deg else 0
                minb = min(deg.values()) if deg else 0
                sigs.append((ncom, nb, maxb, minb))
            if n == 12:
                nfcc = sigs.count((4, 2, 1, 1))
                nhcp = sigs.count((4, 2, 2, 0))
                nico = sigs.count((5, 5, 2, 2))
                if nfcc == 12:
                    out[a] = FCC
                elif nfcc == 6 and nhcp == 6:
                    out[a] = HCP
                elif nico == 12:
                    out[a] = ICOS
                else:
                    out[a] = OTHER
            else:
                nbcc4 = sigs.count((4, 4, 2, 2))
                nbcc6 = sigs.count((6, 6, 2, 2))
                out[a] = BCC if (nbcc4 == 6 and nbcc6 == 8) else OTHER
        return out[valid]

    def _compute_pair_local(self, st, sim, gbit, args):
        """compute pair/local: one row per i<j pair within the force
        cutoff; columns dist/eng/force/fx/fy/fz/dx/dy/dz
        (ref: src/compute_pair_local.cpp, single() loop)."""
        import jax.numpy as _jnp

        from .models import pair as pair_mod

        cols = list(args) or ["dist"]
        pair = sim.forcefield.pair
        nl = sim.nl
        if not hasattr(nl, "idx") or not hasattr(nl, "params"):
            # the runner's default engine keeps a sorted/cell container
            # with no flat [cap, K] matrix — build an analysis list on
            # demand (same pattern as _host_adjacency)
            from .ops import neighbor as _nbr

            p = _nbr.size_for_system(st, cutneigh=pair.max_cutoff(),
                                     skin=0.0)
            sp = sim.forcefield.special
            nl = _nbr.build(st, p, special=sp)
            while bool(nl.overflow):
                p = _nbr.grow(p)
                nl = _nbr.build(st, p, special=sp)
        j, jc, pvalid, dx, r2 = pair_mod.gather_pairs(sim.state, nl)
        cutsq = pair.cutsq_table()[st.type[:, None], st.type[jc]]
        ii = _jnp.arange(st.capacity, dtype=_jnp.int32)[:, None]
        group = st.group_mask(gbit)
        ok = (pvalid & (r2 < cutsq) & (ii < jc)
              & st.valid_mask[:, None] & st.valid_mask[jc]
              & group[:, None] & group[jc])
        w = None
        if nl.sb is not None and sim.forcefield.special is not None:
            # special-excluded pairs are skipped like the reference's
            # half-list (weight-0 entries dropped by sbmask); fractional
            # weights scale eng/force as Pair::single(factor_lj) does
            w = _jnp.asarray(sim.forcefield.special.weights_lj,
                             dtype=st.dtype)[nl.sb]
            ok = ok & (w != 0.0)
        need_eng = any(c in ("eng", "force", "fx", "fy", "fz")
                       for c in cols)
        if need_eng:
            ti = _jnp.broadcast_to(st.type[:, None], r2.shape)
            fpair, evdwl = pair.pair_terms(
                _jnp.clip(r2, 1e-12, None), ti, st.type[jc], True)
            if w is not None:
                fpair = fpair * w
                evdwl = evdwl * w
        okn = np.asarray(ok)
        sel = np.nonzero(okn)
        r = np.sqrt(np.asarray(r2)[sel])
        dxn = np.asarray(dx)[sel]
        out = []
        for c in cols:
            if c == "dist":
                out.append(r)
            elif c == "eng":
                out.append(np.asarray(evdwl)[sel])
            elif c == "force":
                out.append(np.asarray(fpair)[sel] * r)
            elif c in ("fx", "fy", "fz"):
                d = {"fx": 0, "fy": 1, "fz": 2}[c]
                out.append(np.asarray(fpair)[sel] * dxn[:, d])
            elif c in ("dx", "dy", "dz"):
                out.append(dxn[:, {"dx": 0, "dy": 1, "dz": 2}[c]])
            else:
                raise ScriptError(f"pair/local column {c}")
        res = np.stack(out, axis=-1)
        return res[:, 0] if res.shape[1] == 1 else res

    def _compute_chunk_extra(self, style, st, sim, gbit):
        """vcm/chunk, gyration/chunk, angmom/chunk over molecule-ID
        chunks (ref: src/compute_vcm_chunk.cpp, compute_gyration_chunk.cpp,
        compute_angmom_chunk.cpp). Group-masked per ADVICE r4."""
        import jax.numpy as _jnp

        g = st.valid_mask & st.group_mask(gbit)
        m = _jnp.where(g, st.per_atom_mass, 0.0)
        chunk = _jnp.where(g, st.molecule - 1, -1)
        nmol = int(max(self.molecules))
        prd = st.box.prd.astype(st.dtype)
        xu = st.x + st.image.astype(st.dtype) * prd
        ok = chunk >= 0
        idx = _jnp.where(ok, chunk, 0)

        def csum(vals, width=None):
            shape = (nmol,) if width is None else (nmol, width)
            z = _jnp.zeros(shape, st.dtype)
            v = _jnp.where(ok if width is None else ok[:, None], vals, 0.0)
            return z.at[idx].add(v, mode="drop")

        mc = _jnp.maximum(csum(m), 1e-300)
        com = csum(m[:, None] * xu, 3) / mc[:, None]
        if style == "vcm/chunk":
            vcm = csum(m[:, None] * st.v, 3) / mc[:, None]
            return np.asarray(vcm)
        rel = xu - com[idx]
        if style == "gyration/chunk":
            rg2 = csum(m * _jnp.sum(rel * rel, axis=-1)) / mc
            return np.sqrt(np.asarray(rg2))
        # angmom/chunk: L = sum m (r - com) x v
        lx = m * (rel[:, 1] * st.v[:, 2] - rel[:, 2] * st.v[:, 1])
        ly = m * (rel[:, 2] * st.v[:, 0] - rel[:, 0] * st.v[:, 2])
        lz = m * (rel[:, 0] * st.v[:, 1] - rel[:, 1] * st.v[:, 0])
        return np.asarray(csum(_jnp.stack([lx, ly, lz], axis=-1), 3))

    def _compute_heat_flux(self, st, sim, gbit, args):
        """compute heat/flux ke-ID pe-ID stress-ID: 6-vector [Jc+Jv, Jc]
        (unnormalized by volume, as the reference outputs; ref:
        src/compute_heat_flux.cpp — jv -= S.v, jc += e v)."""
        valid = np.asarray(st.valid_mask)

        def per_atom(a):
            """Normalize referenced per-atom outputs to valid-row shape
            (some computes return capacity-padded arrays)."""
            a = np.atleast_1d(np.asarray(a))
            return a[valid] if a.shape[0] == st.capacity else a

        ke_at = per_atom(self.get_compute(args[0]))
        pe_at = per_atom(self.get_compute(args[1]))
        s_at = per_atom(self.get_compute(args[2]))  # [n, 6] Voigt
        v = np.asarray(jax.device_get(st.v))[valid]
        g = np.asarray(st.group_mask(gbit))[valid] != 0
        e = (ke_at + pe_at) * g
        jc = (e[:, None] * v).sum(axis=0)
        sxx, syy, szz, sxy, sxz, syz = (s_at[:, i] * g for i in range(6))
        jv = -np.stack([
            (sxx * v[:, 0] + sxy * v[:, 1] + sxz * v[:, 2]).sum(),
            (sxy * v[:, 0] + syy * v[:, 1] + syz * v[:, 2]).sum(),
            (sxz * v[:, 0] + syz * v[:, 1] + szz * v[:, 2]).sum()])
        jv = jv / sim.units.nktv2p  # stress is in pressure*volume units
        return np.concatenate([jc + jv, jc])

    def _compute_topo_local(self, style, st, sim, args):
        """angle/local (theta/eng) and dihedral/local (phi) rows
        (ref: src/compute_angle_local.cpp, compute_dihedral_local.cpp)."""
        cols = list(args) or (["theta"] if style == "angle/local"
                              else ["phi"])
        top = sim.forcefield.topology
        x = np.asarray(jax.device_get(st.x))
        prd = np.asarray(jax.device_get(st.box.prd))

        def mi(d):
            return d - prd * np.round(d / prd)

        if style == "angle/local":
            arr = (np.asarray(top.angles)
                   if top is not None and top.angles.shape[0] else
                   np.zeros((0, 4), np.int32))
            arr = arr[arr[:, 0] > 0]
            if not len(arr):
                return np.zeros((0, len(cols)))
            d1 = mi(x[arr[:, 1]] - x[arr[:, 2]])
            d2 = mi(x[arr[:, 3]] - x[arr[:, 2]])
            ct = (d1 * d2).sum(-1) / (np.linalg.norm(d1, axis=-1)
                                      * np.linalg.norm(d2, axis=-1))
            theta = np.degrees(np.arccos(np.clip(ct, -1.0, 1.0)))
            out = []
            for c in cols:
                if c == "theta":
                    out.append(theta)
                elif c == "eng":
                    am = sim.forcefield.angle
                    if not hasattr(am, "energy_one"):
                        raise ScriptError("angle/local eng unsupported "
                                          "for this style")
                    e = jax.vmap(am.energy_one)(
                        jnp.asarray(d1, st.dtype), jnp.asarray(d2, st.dtype),
                        jnp.asarray(arr[:, 0], np.int32))
                    out.append(np.asarray(e))
                else:
                    raise ScriptError(f"angle/local column {c}")
            res = np.stack(out, axis=-1)
            return res[:, 0] if res.shape[1] == 1 else res
        arr = (np.asarray(top.dihedrals)
               if top is not None and top.dihedrals.shape[0] else
               np.zeros((0, 5), np.int32))
        arr = arr[arr[:, 0] > 0]
        if not len(arr):
            return np.zeros((0, len(cols)))
        b1 = mi(x[arr[:, 2]] - x[arr[:, 1]])
        b2 = mi(x[arr[:, 3]] - x[arr[:, 2]])
        b3 = mi(x[arr[:, 4]] - x[arr[:, 3]])
        n1 = np.cross(b1, b2)
        n2 = np.cross(b2, b3)
        cphi = (n1 * n2).sum(-1) / np.maximum(
            np.linalg.norm(n1, axis=-1) * np.linalg.norm(n2, axis=-1),
            1e-300)
        sphi = (np.cross(n1, n2) * b2).sum(-1) / np.maximum(
            np.linalg.norm(b2, axis=-1), 1e-300)
        phi = np.degrees(np.arctan2(sphi / np.maximum(
            np.linalg.norm(n1, axis=-1) * np.linalg.norm(n2, axis=-1),
            1e-300), cphi))
        return phi

    def _compute_property_local(self, st, sim, args):
        """property/local: topology/pair index-and-type columns
        (ref: src/compute_property_local.cpp)."""
        tags = np.asarray(jax.device_get(st.tag))
        types = np.asarray(jax.device_get(st.type))
        top = sim.forcefield.topology
        cols = list(args)
        if any(c.startswith(("patom", "ptype")) for c in cols):
            i_idx, j_idx, _ = self._host_adjacency(
                st, sim.forcefield.max_cutoff())
            keep = i_idx < j_idx
            i_idx, j_idx = i_idx[keep], j_idx[keep]
            table = {"patom1": tags[i_idx], "patom2": tags[j_idx],
                     "ptype1": types[i_idx], "ptype2": types[j_idx]}
        else:
            kind = {"b": "bonds", "a": "angles", "d": "dihedrals",
                    "i": "impropers"}[cols[0][0]]
            arr = np.asarray(getattr(top, kind))
            arr = arr[arr[:, 0] > 0]
            table = {}
            for c in cols:
                if c.endswith("type"):
                    table[c] = arr[:, 0]
                else:
                    k = int(c[-1])
                    table[c] = tags[arr[:, k]]
        out = np.stack([table[c].astype(float) for c in cols], axis=-1)
        return out[:, 0] if out.shape[1] == 1 else out

    def _compute_bond_local(self, st, sim, gbit, args):
        """compute bond/local: one row per bond; columns dist/eng/engpot
        (ref: src/compute_bond_local.cpp)."""
        cols = list(args) or ["dist"]
        top = sim.forcefield.topology
        bm = sim.forcefield.bond
        if top is None or not top.bonds.shape[0]:
            return np.zeros((0, len(cols)))
        b = np.asarray(top.bonds)
        live = b[:, 0] > 0
        bt, bi, bj = b[live, 0], b[live, 1], b[live, 2]
        x = np.asarray(st.x)
        import jax.numpy as _jnp

        dx = np.asarray(st.box.min_image(
            _jnp.asarray(x[bi] - x[bj], dtype=st.dtype)))
        r = np.linalg.norm(dx, axis=-1)
        out = []
        for c in cols:
            if c == "dist":
                out.append(r)
            elif c in ("eng", "engpot"):
                if not hasattr(bm, "energy_one"):
                    raise ScriptError("bond/local eng: style has no "
                                      "energy_one")
                import jax

                e = jax.vmap(bm.energy_one)(
                    _jnp.asarray(dx, dtype=st.dtype),
                    _jnp.asarray(bt, dtype=np.int32))
                out.append(np.asarray(e))
            else:
                raise ScriptError(f"bond/local column {c}")
        res = np.stack(out, axis=-1)
        return res[:, 0] if res.shape[1] == 1 else res

    def cmd_minimize(self, a):
        """minimize etol ftol maxiter maxeval (ref: src/min.cpp:429 Min::run;
        CG with the FIRE fallback lives in integrate/minimize.py)."""
        from .integrate.minimize import minimize_fire

        etol, ftol = float(a[0]), float(a[1])
        maxiter = int(a[2])
        sim = self._build_simulation()
        if sim.nl is None:
            sim.setup()
        row0 = sim.thermo()
        state, info = minimize_fire(sim, etol=etol, ftol=ftol,
                                    maxiter=maxiter)
        sim.state = state
        row1 = sim.thermo()
        self._emit(
            f"Minimization: E_pair {row0['pe']:.8g} -> {row1['pe']:.8g} "
            f"(iterations {info['iterations']}, fmax {float(info['fmax']):.3g})"
        )

    def cmd_write_restart(self, a):
        from .io.restart import write_restart

        if self.sim is None:
            self._build_simulation()
        write_restart(self._restart_name(a[0]), self.sim,
                      script_meta=self._script_meta())

    def cmd_restart(self, a):
        """restart N file1 [file2]: scheduled checkpoints every N steps
        during `run` (ref: src/output.cpp:189 restart scheduling). With two
        files they alternate; a `*` in the name becomes the timestep."""
        n = int(a[0])
        if n == 0:
            self._restart_sched = None
            return
        files = list(a[1:3]) if len(a) > 1 else ["restart.*"]
        self._restart_sched = {"every": n, "files": files, "toggle": 0}

    def _restart_name(self, name: str) -> str:
        return name.replace("*", str(self.ntimestep))

    def _write_scheduled_restart(self, sim, step_no: int):
        sched = getattr(self, "_restart_sched", None)
        if not sched or sched["every"] <= 0 or step_no % sched["every"]:
            return
        from .io.restart import write_restart

        files = sched["files"]
        path = files[sched["toggle"] % len(files)]
        sched["toggle"] += 1
        self.ntimestep = step_no
        write_restart(path.replace("*", str(step_no)), sim,
                      script_meta=self._script_meta())

    def _script_meta(self) -> dict:
        return {
            "units": self.units_name,
            "atom_style": self.atom_style,
            "boundary": list(self.boundary),
            "dt": self.dt,
            "skin": self.skin,
            "neigh": [self.neigh_every, self.neigh_delay, self.neigh_check],
            "thermo_every": self.thermo_every,
            "ntimestep": self.ntimestep,
        }

    def cmd_read_restart(self, a):
        """read_restart file: restore the state pytree; styles come from
        the surrounding script commands as usual (our restart stores the
        per-atom payload + fix internals; the reference also serializes
        style coeffs — ref: src/read_restart.cpp)."""
        from .io.restart import read_restart

        state, meta = read_restart(a[0], with_meta=True)
        self._restart_state = state
        if meta:
            self.units_name = meta.get("units", self.units_name)
            self.atom_style = meta.get("atom_style", self.atom_style)
            if meta.get("dt") is not None:
                self.dt = meta["dt"]
            if meta.get("skin") is not None:
                self.skin = meta["skin"]
            if meta.get("neigh"):
                self.neigh_every, self.neigh_delay, self.neigh_check = \
                    meta["neigh"]
            self.ntimestep = int(meta.get("ntimestep", 0))
        import jax as _jax

        from .core.state import atom_order

        rows = atom_order(state)
        self.positions = np.asarray(_jax.device_get(state.x))[rows].tolist()
        self.types = np.asarray(_jax.device_get(state.type))[rows].tolist()
        self.velocities = np.asarray(_jax.device_get(state.v))[rows]
        if state.q is not None:
            self.charges = np.asarray(
                _jax.device_get(state.q))[rows].tolist()
        self.box = state.box
        self.data_masses = np.asarray(_jax.device_get(state.mass))
        self.ntypes = max(self.ntypes, len(self.data_masses) - 1,
                          int(max(self.types)) if self.types else 0)

    def cmd_write_data(self, a):
        from .io.dump import write_data

        if self.sim is None:
            self._build_simulation()
        write_data(a[0], self.sim)

    def _write_dumps(self, step_no):
        if not self.dumps or self.sim is None:
            return
        from .io.dump import (write_cfg_frame, write_dump_frame,
                              write_local_frame)

        for did, d in self.dumps.items():
            if d["every"] > 0 and step_no % d["every"] == 0:
                path = d["path"].replace("*", str(step_no))
                append = "*" not in d["path"]
                if d["style"] == "cfg":
                    write_cfg_frame(path, self.sim, args=d.get("args", ()),
                                    append=append)
                elif d["style"] == "local":
                    write_local_frame(path, self.sim, self,
                                      args=d.get("args", ()),
                                      append=append)
                else:
                    write_dump_frame(path, self.sim, style=d["style"],
                                     args=d.get("args", ()),
                                     append=append,
                                     sort=d.get("sort", False))

    # -- simulation materialization -----------------------------------------

    def _build_simulation(self):
        from .runner import Simulation

        if self.sim is not None:
            return self.sim
        if self.box is None or not self.positions:
            raise ScriptError("no system defined before run")

        x = np.asarray(self.positions)
        types = np.asarray(self.types, dtype=np.int32)
        n = len(x)
        masses = self._mass_table()
        state = create_state(
            x, self.box,
            types=types,
            velocities=self.velocities,
            masses=masses,
            charges=np.asarray(self.charges) if self.charges else None,
            molecules=(np.asarray(self.molecules, dtype=np.int32)
                       if self.molecules else None),
            images=np.asarray(self.images, dtype=np.int32)
            if self.images else None,
            units_name=self.units_name,
            dimension=self.dimension,
            dtype=self.dtype,
        )
        cap = state.capacity

        if self._group_defs:
            state = state.replace(mask=jnp.asarray(
                self._resolve_group_masks(x, types, n, cap)))

        # finite-size sphere / dipole per-atom arrays ride in aux so they
        # integrate, thermostat, and shard with the atoms (the atom->rmass/
        # radius/omega/mu/torque arrays, ref: atom_vec_sphere/dipole)
        if self.sphere_data is not None:
            sd = self.sphere_data
            dtp = state.dtype

            def pad(arr, fill, width=None):
                if arr is None:
                    shape = (cap,) if width is None else (cap, width)
                    return jnp.full(shape, fill, dtype=dtp)
                a = np.full((cap,) + arr.shape[1:], fill, dtype=float)
                a[:n] = arr
                return jnp.asarray(a, dtype=dtp)

            aux = {**state.aux,
                   "torque": jnp.zeros((cap, 3), dtype=dtp)}
            if sd["rmass"] is not None:
                aux["rmass"] = pad(sd["rmass"], 1.0)
                aux["radius"] = pad(sd["radius"], 0.0)
                aux["omega"] = pad(sd["omega"], 0.0, 3)
            if sd["mu"] is not None:
                mu = pad(sd["mu"], 0.0, 3)
                aux["mu"] = mu
                aux["mu_len"] = jnp.sqrt(jnp.sum(mu * mu, axis=-1))
            state = state.replace(aux=aux)

        # RBC membrane styles consume reference positions x0 (the fork's
        # atom_vec_x0image field, ref: src/KOKKOS/atom_vec_x0image_kokkos.cpp)
        if (self.bond_style_name == "wlc_pow_all_visc"
                or self.angle_style_name == "area_volume3"
                or self.dihedral_style_name == "bend2"):
            if getattr(self, "x0_data", None) is not None:
                # explicit rest configuration from an x0image data file
                x0 = np.zeros((cap, 3))
                x0[:n] = np.asarray(self.x0_data)
                x0j = jnp.asarray(x0, dtype=state.x.dtype)
            else:
                x0j = state.x
            state = state.replace(aux={**state.aux, "x0": x0j})

        # fix shake pre-pass: build constraints AND remove constrained
        # bonds/angles from the force topology (ref: fix_shake.cpp:2775,2832
        # — constrained types are negated so ntopo skips them)
        shake_fix = self._build_shake(types, cap)

        # fix rigid pre-pass: body map lives in state.aux (the integrator's
        # setup derives masses/inertia/frames from it)
        rigid_integ, state = self._build_rigid(state, x, types, cap, n)

        ff = self._build_forcefield(state, cap, n)
        integ, fixes = self._build_fixes(state)
        if shake_fix is not None:
            fixes = fixes + (shake_fix,)
        if rigid_integ is not None:
            integ = rigid_integ

        units = get_units(self.units_name)
        sim = Simulation(
            state, ff,
            dt=self.dt,
            integrator=integ,
            fixes=fixes,
            skin=self.skin,
            neigh_every=self.neigh_every,
            neigh_delay=self.neigh_delay,
            neigh_check=self.neigh_check,
            respa=self.respa,
            list_mode=self.list_mode,
        )
        sim.thermo_norm = self.thermo_norm
        for d, tok in enumerate(self.boundary):
            lo_st = tok[0]
            hi_st = tok[1] if len(tok) > 1 else tok[0]
            if "s" in (lo_st, hi_st) or "m" in (lo_st, hi_st):
                blo = getattr(self, "_box_lo_np", None)
                bhi = getattr(self, "_box_hi_np", None)
                lo0 = blo[d] if blo is not None else 0.0
                hi0 = bhi[d] if bhi is not None else 1.0
                sim.shrink_dims[d] = (lo_st in "sm", hi_st in "sm",
                                      1e-4 * (hi0 - lo0))
        sim.setup()
        sim.ntimestep = self.ntimestep
        self.sim = sim
        return sim

    def _build_forcefield(self, state, cap, natoms):
        from .models.pair_charmm import (
            PairCoul, PairZero, make_lj_charmm_coul_long, make_lj_cut_coul,
        )
        from .models.pair_eam import make_eam_funcfl, make_eam_setfl
        from .models.pair_lj import make_lj_cut
        from .models.pair_tersoff import make_tersoff

        pair = None
        kspace = None
        g_ewald = float(self.kspace_modify.get("gewald", 0.0))

        # a barostat rescales the box every half-step: the kspace solver
        # must re-derive G(k)/u(k) from the live box inside the step
        # (ref: FixNH::initial_integrate -> kspace->setup(),
        # src/fix_nh.cpp:874-876)
        dynamic_box = any(f.style in ("npt", "nph") for f in self.fixes)
        kspace_tip4p = False

        if self.kspace_words:
            kname = self.kspace_words[0]
            accuracy = float(self.kspace_words[1])
            if g_ewald == 0.0:
                from .models.ewald import g_ewald_estimate

                cut = self._pair_cut_guess()
                g_ewald = g_ewald_estimate(accuracy, cut)
            if kname in ("pppm", "pppm/tip4p"):
                from .models.pppm import PPPM

                kspace = PPPM.create(self.box, g_ewald,
                                     accuracy_rel=accuracy,
                                     dtype=jnp.float64,
                                     dynamic=dynamic_box,
                                     natoms=len(self.positions))
                kspace_tip4p = kname == "pppm/tip4p"
            elif kname == "ewald":
                from .models.ewald import Ewald

                kspace = Ewald.create(self.box, g_ewald,
                                      accuracy_rel=accuracy,
                                      dtype=jnp.float64,
                                      dynamic=dynamic_box)
            elif kname in ("msm", "msm/cg"):
                from .models.msm import MSM

                if dynamic_box:
                    raise ScriptError(
                        "kspace msm under a barostat unsupported (grid "
                        "kernels are box-dependent)")
                import numpy as _np

                qs = _np.asarray(jax.device_get(state.q))
                vm = _np.asarray(jax.device_get(state.valid_mask))
                kspace = MSM.create(
                    self.box, cutoff=self._pair_cut_guess(),
                    accuracy_rel=accuracy, natoms=natoms,
                    qsqsum=float((qs[vm] ** 2).sum()),
                    qqrd2e=get_units(self.units_name).qqr2e,
                    scalar_pressure=self.kspace_modify.get(
                        "pressure/scalar", "yes") == "yes",
                    dtype=jnp.float64)
            else:
                raise ScriptError(f"kspace style {kname} unsupported")

        if (self.pair_style_words
                and self.pair_modify.get("compute", "on") == "off"):
            # pair_modify compute off: the pair style exists (its geometry
            # params remain extractable) but contributes no force/energy
            # (ref: src/pair.cpp modify_params compute flag)
            pass
        elif self.pair_style_words:
            words = self.pair_style_words
            name = words[0]
            args = words[1:]
            if name == "hybrid" and args and not _is_num(args[0]):
                pair = self._build_pair_hybrid(args, state, cap, g_ewald)
            else:
                pair = self._make_pair_style(name, args, state, cap,
                                             g_ewald)

        bond = angle = dihedral = improper = None
        dt = jnp.float64 if self.dtype == jnp.float64 else self.dtype
        if self.bond_style_name == "harmonic":
            bond = bonded.make_bond_harmonic(self.nbondtypes,
                                             self.bond_coeffs, dtype=dt)
        elif self.bond_style_name == "fene":
            bond = bonded.make_bond_fene(self.nbondtypes, self.bond_coeffs,
                                         dtype=dt)
        elif self.bond_style_name == "wlc_pow_all_visc":
            from .models import rbc

            dt_step = (self.dt if self.dt is not None
                       else get_units(self.units_name).dt)
            bond = rbc.make_bond_wlc_pow_all_visc(
                self.nbondtypes, self.bond_coeffs, dt=dt_step, dtype=dt)
        if self.angle_style_name == "harmonic":
            angle = bonded.make_angle_harmonic(self.nangletypes,
                                               self.angle_coeffs, dtype=dt)
        elif self.angle_style_name == "charmm":
            angle = bonded.make_angle_charmm(self.nangletypes,
                                             self.angle_coeffs, dtype=dt)
        elif self.angle_style_name == "cosine":
            angle = bonded.make_angle_cosine(self.nangletypes,
                                             self.angle_coeffs, dtype=dt)
        elif self.angle_style_name == "area_volume3":
            from .models import rbc

            nmol = int(max(self.molecules)) if self.molecules else 1
            angle = rbc.make_angle_area_volume3(
                self.nangletypes, self.angle_coeffs, nmol=nmol, dtype=dt)
        if self.dihedral_style_name == "charmm":
            dihedral = bonded.make_dihedral_charmm(
                self.ndihedraltypes, self.dihedral_coeffs, dtype=dt,
                pair=pair, qqr2e=get_units(self.units_name).qqr2e)
        elif self.dihedral_style_name == "harmonic":
            conv = {t: (c[0], c[2], c[1])
                    for t, c in self.dihedral_coeffs.items()}
            k, nn, d = bonded.table(self.ndihedraltypes, conv, 3, dt)
            dihedral = bonded.DihedralHarmonic(k=k, n=nn, d=d)
        elif self.dihedral_style_name == "opls":
            dihedral = bonded.make_dihedral_opls(self.ndihedraltypes,
                                                 self.dihedral_coeffs,
                                                 dtype=dt)
        elif self.dihedral_style_name == "bend2":
            from .models import rbc

            dihedral = rbc.make_dihedral_bend2(
                self.ndihedraltypes, self.dihedral_coeffs, dtype=dt)

        # extended bonded styles (models/bonded_extra.py)
        from .models import bonded_extra as bx

        _extra = {
            ("bond", "gromos"): bx.make_bond_gromos,
            ("bond", "morse"): bx.make_bond_morse,
            ("bond", "nonlinear"): bx.make_bond_nonlinear,
            ("bond", "class2"): bx.make_bond_class2,
            ("bond", "harmonic/shift"): bx.make_bond_harmonic_shift,
            ("bond", "harmonic/shift/cut"): bx.make_bond_harmonic_shift_cut,
            ("bond", "fene/expand"): bx.make_bond_fene_expand,
            ("angle", "cosine/squared"): bx.make_angle_cosine_squared,
            ("angle", "quartic"): bx.make_angle_quartic,
            ("angle", "cosine/delta"): bx.make_angle_cosine_delta,
            ("angle", "cosine/periodic"): bx.make_angle_cosine_periodic,
            ("angle", "fourier"): bx.make_angle_fourier,
            ("angle", "fourier/simple"): bx.make_angle_fourier_simple,
            ("angle", "cosine/shift"): bx.make_angle_cosine_shift,
            ("angle", "cosine/shift/exp"): bx.make_angle_cosine_shift_exp,
            ("dihedral", "multi/harmonic"): bx.make_dihedral_multi_harmonic,
            ("dihedral", "nharmonic"): bx.make_dihedral_nharmonic,
            ("dihedral", "quadratic"): bx.make_dihedral_quadratic,
            ("dihedral", "helix"): bx.make_dihedral_helix,
            ("improper", "cvff"): bx.make_improper_cvff,
            ("improper", "cossq"): bx.make_improper_cossq,
            ("improper", "umbrella"): bx.make_improper_umbrella,
        }
        if bond is None and ("bond", self.bond_style_name) in _extra:
            bond = _extra[("bond", self.bond_style_name)](
                self.nbondtypes, self.bond_coeffs, dtype=dt)
        if angle is None and ("angle", self.angle_style_name) in _extra:
            angle = _extra[("angle", self.angle_style_name)](
                self.nangletypes, self.angle_coeffs, dtype=dt)
        if dihedral is None and ("dihedral", self.dihedral_style_name) in _extra:
            dihedral = _extra[("dihedral", self.dihedral_style_name)](
                self.ndihedraltypes, self.dihedral_coeffs, dtype=dt)
        if self.improper_style_name == "harmonic":
            improper = bonded.make_improper_harmonic(self.nimpropertypes,
                                                     self.improper_coeffs,
                                                     dtype=dt)
        elif ("improper", self.improper_style_name) in _extra:
            improper = _extra[("improper", self.improper_style_name)](
                self.nimpropertypes, self.improper_coeffs, dtype=dt)

        top = None
        special = None
        raw = self.topology_raw
        if raw.get("bonds") is not None:
            def local(arr):
                if arr is None:
                    return None
                out = np.asarray(arr).copy()
                out[:, 1:] -= 1
                return out

            top = pad_topology(
                cap,
                bonds=local(raw.get("bonds")),
                angles=local(raw.get("angles")),
                dihedrals=local(raw.get("dihedrals")),
                impropers=local(raw.get("impropers")),
            )
            wl = self.special
            wc = self.special_coul or self.special
            mode = "mask" if kspace is not None else "exclude"
            special = build_special(
                natoms, cap, local(raw["bonds"])[:, 1:],
                weights_lj=wl, weights_coul=wc, mode=mode,
            )

        if kspace_tip4p:
            from .models.pair_tip4p import PairTIP4PCut
            from .models.pppm import PPPMTIP4P

            if not isinstance(pair, PairTIP4PCut):
                raise ScriptError(
                    "kspace pppm/tip4p needs a tip4p pair style")
            kspace = PPPMTIP4P(pppm=kspace, qO_h1=pair.qO_h1,
                               qO_h2=pair.qO_h2, alpha=pair.alpha)

        return ForceField(
            pair=pair, bond=bond, angle=angle, dihedral=dihedral,
            improper=improper, kspace=kspace, topology=top, special=special,
        )

    def _build_sph_pair(self, name: str, args: list[str]):
        """SPH styles, incl. the canonical
        `hybrid/overlay sph/rhosum N sph/taitwater[...]` which fuses into
        one summation-density style (ref: examples/PACKAGES/sph decks;
        models/pair_sph.py docstring for the design)."""
        from .models.pair_sph import make_sph_rhosum, make_sph_taitwater

        def rows_for(sub: str | None):
            out = {}
            for c in self.pair_coeffs:
                toks = list(c)
                if len(toks) > 2 and not _is_num(toks[2]):
                    if sub is None or toks[2] != sub:
                        continue
                    vals = toks[3:]
                elif sub is not None and name == "hybrid/overlay":
                    continue
                else:
                    vals = toks[2:]
                ii = (range(1, self.ntypes + 1) if toks[0] == "*"
                      else [int(toks[0])])
                jj = (range(1, self.ntypes + 1) if toks[1] == "*"
                      else [int(toks[1])])
                for i in ii:
                    for j in jj:
                        if j >= i:
                            out[(i, j)] = tuple(float(v) for v in vals)
            return out

        if name == "sph/rhosum":
            return make_sph_rhosum(self.ntypes, rows_for(None),
                                   dimension=self.dimension)
        if name in ("sph/taitwater", "sph/taitwater/morris"):
            return make_sph_taitwater(
                self.ntypes, rows_for(None), morris=name.endswith("morris"),
                dimension=self.dimension)
        # hybrid/overlay: rhosum + taitwater[/morris]
        tait_name = next(w for w in args if w.startswith("sph/taitwater"))
        tait = rows_for(tait_name)
        rho_cut = {k: v[0] for k, v in rows_for("sph/rhosum").items()}
        return make_sph_taitwater(
            self.ntypes, tait, morris=tait_name.endswith("morris"),
            rho_cut=rho_cut or None, dimension=self.dimension)

    def _pair_coeff_dict(self):
        coeffs = {}
        for c in self.pair_coeffs:
            ii = (range(1, self.ntypes + 1) if c[0] == "*"
                  else [int(c[0])])
            jj = (range(1, self.ntypes + 1) if c[1] == "*"
                  else [int(c[1])])
            vals = tuple(float(v) for v in c[2:])
            for i in ii:
                for j in jj:
                    if j >= i:
                        coeffs[(i, j)] = vals
        return coeffs

    def _build_pair_hybrid(self, toks, state, cap, g_ewald):
        """pair_style hybrid [sub1 args... sub2 args...]: route each type
        pair to its sub-style (ref: src/pair_hybrid.cpp:90-240 — sub-style
        neighbor skip lists become per-type-pair cutoff masks over the
        shared list). Single-sub-style degenerates to the plain style."""
        subs: list = []
        for w in toks:
            if _is_num(w) and subs:
                subs[-1][1].append(w)
            else:
                subs.append([w, []])
        names = [n for n, _ in subs]
        if len(set(names)) != len(names):
            raise ScriptError(
                "pair hybrid: repeated sub-style names unsupported")
        if len(subs) == 1:
            name, sargs = subs[0]
            self.pair_coeffs = [[t for t in row if t != name]
                                for row in self.pair_coeffs]
            return self._make_pair_style(name, sargs, state, cap, g_ewald)

        nt = self.ntypes
        rows = self.pair_coeffs
        per: list = [[] for _ in subs]
        assigned: dict = {}
        for r in rows:
            if len(r) < 3:
                continue
            ii = range(1, nt + 1) if r[0] == "*" else [int(r[0])]
            jj = range(1, nt + 1) if r[1] == "*" else [int(r[1])]
            ps = [(i, j) for i in ii for j in jj if j >= i]
            if r[2] == "none":
                for p_ in ps:
                    assigned[p_] = []
                continue
            if r[2] not in names:
                raise ScriptError(
                    f"pair_coeff sub-style {r[2]} not in hybrid styles")
            idx = names.index(r[2])
            per[idx].append([r[0], r[1]] + list(r[3:]))
            for p_ in ps:
                assigned[p_] = [idx]
        # unset (i,j): mix within a sub-style only when both diagonals map
        # to the SAME single sub-style (ref: pair_hybrid.cpp:708-719)
        for i in range(1, nt + 1):
            for j in range(i, nt + 1):
                if (i, j) in assigned:
                    continue
                di = assigned.get((i, i), [])
                dj = assigned.get((j, j), [])
                if len(di) == 1 and di == dj:
                    assigned[(i, j)] = list(di)
                else:
                    raise ScriptError(
                        f"pair hybrid: coeffs for ({i},{j}) not set and "
                        "not mixable")
        pairs: list = [[] for _ in subs]
        for p_, lst in assigned.items():
            for idx in lst:
                pairs[idx].append(p_)

        saved = self.pair_coeffs
        styles = []
        try:
            for (name, sargs), rws, prs in zip(subs, per, pairs):
                # satisfy the single-style builder's (i,i)-set check with
                # zero rows for foreign types (masked out anyway; the
                # reference only calls init_one for owned pairs)
                have_diag = {i for (i, j) in prs if i == j}
                arity = max((sum(1 for t in r[2:] if _is_num(t))
                             for r in rws), default=0)
                for t in range(1, nt + 1):
                    if t not in have_diag:
                        rws = rws + [[str(t), str(t)] + ["0"] * arity]
                self.pair_coeffs = rws
                styles.append(self._make_pair_style(name, sargs, state,
                                                    cap, g_ewald))
        finally:
            self.pair_coeffs = saved

        from .models.pair_zbl import make_hybrid

        return make_hybrid(nt, list(zip(styles, pairs)))

    def _make_pair_style(self, name, args, state, cap, g_ewald):
        """Construct ONE pair style object from its name + style args,
        reading coeff rows from self.pair_coeffs (the per-style factory
        analog of force->create_pair, ref: src/force.cpp:83-121)."""
        from .models.pair_charmm import (
            PairCoul, PairZero, make_lj_charmm_coul_long, make_lj_cut_coul,
        )
        from .models.pair_eam import make_eam_funcfl, make_eam_setfl
        from .models.pair_lj import make_lj_cut
        from .models.pair_tersoff import make_tersoff
        numeric_styles = (
            "lj/cut", "lj/charmm/coul/long", "lj/cut/coul/long",
            "lj/cut/coul/cut", "coul/long", "coul/cut",
            "lj/cut/tip4p/cut", "lj/cut/tip4p/long",
            "tip4p/cut", "tip4p/long",
        )
        coeffs = (self._pair_coeff_dict()
                  if name in numeric_styles else {})
        mix = self.pair_modify.get("mix", None)
        shift = self.pair_modify.get("shift", "no") == "yes"
        dt = self.dtype
        if name == "lj/cut":
            pair = make_lj_cut(self.ntypes, coeffs, float(args[0]),
                               mix=mix or "geometric", shift=shift,
                               dtype=dt)
        elif name in ("lj/cut/tip4p/cut", "lj/cut/tip4p/long",
                      "tip4p/cut", "tip4p/long"):
            # TIP4P family: needs the equilibrium bond/angle geometry
            # and the bond topology (finalized in _build_forcefield,
            # after read_data) -> defer via a builder closure
            otype, htype, btype, atype = (int(w) for w in args[:4])
            qdist = float(args[4])
            cut = float(args[5])
            cut2 = float(args[6]) if len(args) > 6 else cut
            lj_on = name.startswith("lj/cut")
            cmode = "long" if name.endswith("long") else "cut"
            from .models.pair_tip4p import make_lj_cut_tip4p_cut

            bc = self.bond_coeffs.get(btype)
            ac = self.angle_coeffs.get(atype)
            if bc is None or ac is None:
                raise ScriptError(
                    "tip4p styles need bond/angle coeffs for the "
                    "designated types (equilibrium geometry)")
            blen = float(bc[1]) if len(bc) > 1 else float(bc[0])
            theta = float(ac[1]) if len(ac) > 1 else float(ac[0])
            braw = self.topology_raw.get("bonds")
            if braw is None:
                raise ScriptError("tip4p styles need bond topology")
            import numpy as _np

            bl = _np.asarray(braw).copy()
            bl[:, 1:] -= 1  # 1-based atom ids -> local rows
            pair = make_lj_cut_tip4p_cut(
                self.ntypes, coeffs, typeO=otype, typeH=htype,
                qdist=qdist, blen=blen, theta_deg=theta,
                cut_lj=cut if lj_on else 0.0,
                cut_coul=cut2 if lj_on else cut,
                bonds=bl, types=_np.asarray(state.type), cap=cap,
                mix=mix or "geometric", lj_on=lj_on,
                coul_mode=cmode, g_ewald=g_ewald, dtype=dt)
        elif name == "lj/charmm/coul/long":
            cut_coul = float(args[2]) if len(args) > 2 else float(args[1])
            pair = make_lj_charmm_coul_long(
                self.ntypes, coeffs, float(args[0]), float(args[1]),
                cut_coul, g_ewald=g_ewald, mix=mix or "arithmetic",
                dtype=dt)
        elif name in ("lj/cut/coul/long", "lj/cut/coul/cut"):
            mode = "long" if name.endswith("long") else "cut"
            cut_coul = float(args[1]) if len(args) > 1 else float(args[0])
            pair = make_lj_cut_coul(
                self.ntypes, coeffs, float(args[0]), cut_coul,
                g_ewald=g_ewald, coul_mode=mode,
                mix=mix or "geometric", dtype=dt)
        elif name in ("coul/long", "coul/cut"):
            mode = "long" if name.endswith("long") else "cut"
            pair = PairCoul.create(self.ntypes, float(args[0]), coeffs,
                                   g_ewald=g_ewald, coul_mode=mode,
                                   mix=mix or "geometric", dtype=dt)
        elif name == "coul/msm":
            from .models.pair_coul_misc import PairVdwCoul

            # gamma split order = kspace order/2 (default order 10,
            # ref: msm.cpp:77, pair_coul_msm.cpp gamma calls)
            pair = PairVdwCoul(vdw=None, ntypes=self.ntypes,
                               coul_mode="msm", alpha=5,
                               cut_coul=float(args[0]))
        elif name == "eam":
            files = {}
            for c in self.pair_coeffs:
                t = int(c[0])
                files[t] = c[2]
            pair = make_eam_funcfl(self.ntypes, files, dtype=dt)
        elif name in ("eam/alloy", "eam/fs"):
            c = self.pair_coeffs[0]
            pair = make_eam_setfl(
                self.ntypes, c[2], type_elements=list(c[3:3 + self.ntypes]),
                fs=name.endswith("fs"), dtype=dt)
        elif name == "tersoff":
            c = self.pair_coeffs[0]
            pair = make_tersoff(self.ntypes, c[2],
                                list(c[3:3 + self.ntypes]), dtype=dt)
        elif name == "sw":
            from .models.pair_sw import make_sw

            c = self.pair_coeffs[0]
            pair = make_sw(self.ntypes, c[2],
                           list(c[3:3 + self.ntypes]), dtype=dt)
        elif name == "snap":
            from .models.pair_snap import make_snap

            c = self.pair_coeffs[0]
            pair = make_snap(self.ntypes, c[2], c[3],
                             list(c[4:4 + self.ntypes]), dtype=dt)
        elif name == "zbl":
            from .models.pair_zbl import make_zbl

            zmap = {}
            for c in self.pair_coeffs:
                ii = (range(1, self.ntypes + 1) if c[0] == "*"
                      else [int(c[0])])
                for t in ii:
                    zmap[t] = float(c[2])
            pair = make_zbl(self.ntypes, float(args[0]), float(args[1]),
                            zmap,
                            qqr2e=get_units(self.units_name).qqr2e,
                            dtype=dt)
        elif name in ("morse", "buck", "gauss"):
            from .models import pair_simple as psim

            maker = {"morse": psim.make_morse, "buck": psim.make_buck,
                     "gauss": psim.make_gauss}[name]
            pair = maker(self.ntypes, self._pair_coeff_dict(),
                         float(args[0]), shift=shift, dtype=dt)
        elif name == "yukawa":
            from .models.pair_simple import make_yukawa

            pair = make_yukawa(self.ntypes, float(args[0]),
                               self._pair_coeff_dict(), float(args[1]),
                               shift=shift, dtype=dt)
        elif name in ("lj/class2", "lj96/cut", "mie/cut", "nm/cut",
                      "lj/smooth/linear", "soft", "gauss/cut", "ufm",
                      "wf/cut", "lj/cubic", "lj/gromacs"):
            from .models import pair_extra as px

            mx = mix or "geometric"
            cd = self._pair_coeff_dict()
            if name == "lj/gromacs":
                pair = px.make_lj_gromacs(self.ntypes, cd,
                                          float(args[0]), float(args[1]),
                                          mix=mx, dtype=dt)
            elif name == "lj/cubic":
                pair = px.make_lj_cubic(self.ntypes, cd, mix=mx,
                                        dtype=dt)
            else:
                maker = {"lj/class2": px.make_lj_class2,
                         "lj96/cut": px.make_lj96,
                         "mie/cut": px.make_mie,
                         "nm/cut": px.make_nm_cut,
                         "lj/smooth/linear": px.make_lj_smooth_linear,
                         "soft": px.make_soft,
                         "gauss/cut": px.make_gauss_cut,
                         "ufm": px.make_ufm,
                         "wf/cut": px.make_wf_cut}[name]
                import inspect

                kw = {"dtype": dt, "mix": mx}
                if "shift" in inspect.signature(maker).parameters:
                    kw["shift"] = shift
                if "mix" not in inspect.signature(maker).parameters:
                    kw.pop("mix")
                pair = maker(self.ntypes, cd, float(args[0]), **kw)
        elif name == "zero":
            pair = PairZero(ntypes=self.ntypes, cut=float(args[0]))
        elif name in ("gran/hooke", "gran/hooke/history"):
            from .models.pair_gran import PairGranHooke

            def _gnum(w, default):
                return default if w == "NULL" else float(w)

            kn = float(args[0])
            kt = _gnum(args[1], kn * 2.0 / 7.0)
            gamman = float(args[2])
            gammat = _gnum(args[3], 0.5 * gamman)
            if int(args[5]) == 0:
                gammat = 0.0
            fzbit = 0
            for fx in self.fixes:
                if fx.style == "freeze":
                    fzbit = self.groups.get(fx.group, 1)
            maxrad = (float(np.max(self.sphere_data["radius"]))
                      if self.sphere_data else 0.5)
            gdt = self.dt if self.dt is not None \
                else get_units(self.units_name).dt
            pair = PairGranHooke(
                kn=kn, kt=kt, gamman=gamman, gammat=gammat,
                xmu=float(args[4]), dt=gdt, freeze_groupbit=fzbit,
                max_radius=maxrad, history=name.endswith("history"))
        elif name == "lj/cut/dipole/cut":
            from .models.pair_dipole import make_lj_cut_dipole_cut

            pair = make_lj_cut_dipole_cut(
                self.ntypes, self._pair_coeff_dict(), float(args[0]),
                float(args[1]) if len(args) > 1 else None,
                qqrd2e=get_units(self.units_name).qqr2e,
                mix=self.pair_modify.get("mix", "geometric"), dtype=dt)
        elif name in ("sph/taitwater", "sph/taitwater/morris",
                      "sph/rhosum") or (
                name == "hybrid/overlay"
                and any(w.startswith("sph/") for w in args)):
            pair = self._build_sph_pair(name, args)
        else:
            raise ScriptError(f"pair style {name} unsupported")
        return pair

    def _pair_cut_guess(self) -> float:
        if self.pair_style_words and len(self.pair_style_words) > 1:
            try:
                return float(self.pair_style_words[-1])
            except ValueError:
                pass
        return 10.0

    def _build_rigid(self, state, x, types, cap: int, n: int):
        """Materialize `fix <g> rigid|rigid/nve[/small] single|molecule|
        group N g1..` (ref: src/RIGID/fix_rigid.cpp body styles; /small
        variants share the physics). Installs the [cap] body map in
        state.aux and returns the rigid integrator."""
        spec = next((f for f in self.fixes
                     if f.style.split("/")[0] == "rigid"), None)
        if spec is None:
            return None, state
        parts = spec.style.split("/")
        if any(p not in ("rigid", "nve", "nvt", "npt", "nph", "small")
               for p in parts):
            raise ScriptError(f"fix {spec.style} unsupported")
        from .integrate.rigid import (IntegratorRigid, IntegratorRigidNH,
                                      build_rigid_bodies)

        gm = self._resolve_group_masks(x, types, n, cap)
        gbit = self.groups.get(spec.group, 1)
        groupmask = (gm & gbit) != 0
        bstyle = spec.args[0]
        mol = None
        gmasks = None
        if bstyle == "molecule":
            mol = np.full(cap, -1, dtype=np.int64)
            mol[:n] = np.asarray(self.molecules, dtype=np.int64)
        elif bstyle == "group":
            ng = int(spec.args[1])
            gmasks = []
            for gname in spec.args[2:2 + ng]:
                gb = self.groups.get(gname)
                if gb is None:
                    raise ScriptError(f"fix rigid group {gname} undefined")
                gmasks.append((gm & gb) != 0)
        body, nbody = build_rigid_bodies(cap, groupmask, bstyle,
                                         molecule=mol, group_masks=gmasks)
        state = state.replace(aux={**state.aux,
                                   "rigid_body": jnp.asarray(body)})
        units = get_units(self.units_name)
        dt_step = self.dt if self.dt is not None else units.dt
        kind = ("nvt" if "nvt" in parts else "npt" if "npt" in parts
                else "nph" if "nph" in parts else "nve")
        if kind == "nve":
            return IntegratorRigid(dt=dt_step, units=units, groupbit=gbit,
                                   nbody=nbody), state

        # thermostatted/barostatted variants (ref: fix_rigid_nh.cpp).
        # DOF: nf_t = 3*nbody; nf_r = 3*nbody minus zero-inertia dims —
        # the inertia eigenvalues come from the same setup math, so count
        # on the host here (ref: FixRigidNH::init nf_t/nf_r)
        kw = {}
        skip = (2 + int(spec.args[1])) if bstyle == "group" else 1
        args = list(spec.args[skip:])
        i = 0
        while i < len(args):
            a = args[i]
            if a == "temp":
                kw.update(tstat=True, t_start=float(args[i + 1]),
                          t_stop=float(args[i + 2]),
                          t_period=float(args[i + 3]))
                i += 4
            elif a in ("iso", "aniso"):
                kw.update(pstat=True,
                          p_start=(float(args[i + 1]),) * 3,
                          p_stop=(float(args[i + 2]),) * 3,
                          p_period=(float(args[i + 3]),) * 3,
                          p_flag=(True, True, True),
                          pcouple="iso" if a == "iso" else "aniso")
                i += 4
            elif a == "tparam":
                kw.update(t_chain=int(args[i + 1]),
                          t_iter=int(args[i + 2]),
                          t_order=int(args[i + 3]))
                i += 4
            elif a == "pchain":
                kw.update(p_chain=int(args[i + 1]))
                i += 2
            else:
                i += 2
        if kind in ("npt", "nph") and not kw.get("pstat"):
            raise ScriptError(f"fix rigid/{kind} needs a barostat")
        if kind == "nph":
            kw.pop("tstat", None)

        # host-side inertia for DOF counting (mirrors IntegratorRigid.setup)
        nf_t = 3.0 * nbody
        nf_r = 3.0 * nbody
        xs = np.asarray(self.positions)
        ms = self._mass_table()[types]
        for ib in range(nbody):
            idx = np.flatnonzero(body[:n] == ib)
            d = xs[idx] - np.average(xs[idx], axis=0,
                                     weights=ms[idx])
            mm = ms[idx]
            t = np.zeros((3, 3))
            t[0, 0] = np.sum(mm * (d[:, 1] ** 2 + d[:, 2] ** 2))
            t[1, 1] = np.sum(mm * (d[:, 0] ** 2 + d[:, 2] ** 2))
            t[2, 2] = np.sum(mm * (d[:, 0] ** 2 + d[:, 1] ** 2))
            t[0, 1] = t[1, 0] = -np.sum(mm * d[:, 0] * d[:, 1])
            t[0, 2] = t[2, 0] = -np.sum(mm * d[:, 0] * d[:, 2])
            t[1, 2] = t[2, 1] = -np.sum(mm * d[:, 1] * d[:, 2])
            ev = np.linalg.eigvalsh(t)
            nf_r -= int(np.sum(np.abs(ev) < 1e-7 * max(ev.max(), 1e-300)))
        # 'all' temp compute DOF with the rigid fix's removal
        # (ref: FixRigid::dof: each wholly-counted 3d body removes 3N-6,
        # or 3N-5 when linear)
        removed = 0
        for ib in range(nbody):
            nb_atoms = int(np.sum(body[:n] == ib))
            xs_b = xs[np.flatnonzero(body[:n] == ib)]
            # linear if a zero principal moment
            idx = np.flatnonzero(body[:n] == ib)
            d = xs[idx] - np.average(xs[idx], axis=0, weights=ms[idx])
            mm = ms[idx]
            t = np.zeros((3, 3))
            t[0, 0] = np.sum(mm * (d[:, 1] ** 2 + d[:, 2] ** 2))
            t[1, 1] = np.sum(mm * (d[:, 0] ** 2 + d[:, 2] ** 2))
            t[2, 2] = np.sum(mm * (d[:, 0] ** 2 + d[:, 1] ** 2))
            t[0, 1] = t[1, 0] = -np.sum(mm * d[:, 0] * d[:, 1])
            t[0, 2] = t[2, 0] = -np.sum(mm * d[:, 0] * d[:, 2])
            t[1, 2] = t[2, 1] = -np.sum(mm * d[:, 1] * d[:, 2])
            ev = np.linalg.eigvalsh(t)
            linear = np.any(np.abs(ev) < 1e-7 * max(ev.max(), 1e-300))
            removed += 3 * nb_atoms - (5 if linear else 6)
        press_tdof = 3.0 * n - 3.0 - removed
        integ = IntegratorRigidNH(dt=dt_step, units=units, groupbit=gbit,
                                  nbody=nbody, nf_t=nf_t, nf_r=nf_r,
                                  press_tdof=press_tdof,
                                  needs_virial=kw.get("pstat", False),
                                  **kw)
        return integ, state

    def _build_shake(self, types: np.ndarray, cap: int):
        """Materialize `fix ... shake tol iter N [b types] [a types]
        [t types] [m masses]` (ref: src/RIGID/fix_shake.cpp:114-162 arg
        parse; :925-965 eligibility — bond type in b, either atom type in
        t, or either atom mass within 0.1 of an m value). Constrained
        bonds/angles are zeroed out of the force topology like the
        reference's type negation (fix_shake.cpp:2775,2832)."""
        spec = next((f for f in self.fixes
                     if f.style in ("shake", "rattle")), None)
        if spec is None:
            return None
        raw = self.topology_raw
        if raw.get("bonds") is None:
            raise ScriptError("fix shake requires bond topology")

        btypes, atypes, ttypes, mlist = [], [], [], []
        args = spec.args
        i = 3  # tol, maxiter, output-every
        cur = None
        while i < len(args):
            w = args[i]
            if w in ("b", "a", "t", "m"):
                cur = w
            elif w in ("mol", "kbond"):
                raise ScriptError(f"fix shake keyword {w} unsupported")
            else:
                {"b": btypes, "a": atypes, "t": ttypes,
                 "m": mlist}[cur].append(float(w))
            i += 1
        btypes = [int(v) for v in btypes]
        atypes = [int(v) for v in atypes]
        ttypes = [int(v) for v in ttypes]

        masses = self._mass_table()
        bonds = np.asarray(raw["bonds"])  # [nb, 3] (type, tag_i, tag_j)
        bl = bonds.copy()
        bl[:, 1:] -= 1  # local indices
        ti = types[bl[:, 1]]
        tj = types[bl[:, 2]]
        MASSDELTA = 0.1  # ref: fix_shake.cpp:45
        msel = np.zeros(len(bl), dtype=bool)
        for m in mlist:
            msel |= np.abs(masses[ti] - m) <= MASSDELTA
            msel |= np.abs(masses[tj] - m) <= MASSDELTA
        sel = (np.isin(bl[:, 0], btypes) | np.isin(ti, ttypes)
               | np.isin(tj, ttypes) | msel)
        # the fix's group scopes eligibility: ALL cluster atoms must be in
        # the group (ref: fix_shake.cpp:925 `mask[i] & groupbit` per atom)
        if spec.group != "all" and self._group_defs:
            n = len(types)
            gm = self._resolve_group_masks(
                np.asarray(self.positions), types, n, n)
            gbit = self.groups.get(spec.group, 1)
            ing = (gm & gbit) != 0
            sel &= ing[bl[:, 1]] & ing[bl[:, 2]]
        sel_bonds = bl[sel]

        bond_r0 = {}
        for t in np.unique(sel_bonds[:, 0]):
            c = self.bond_coeffs.get(int(t))
            if c is None:
                raise ScriptError(f"fix shake: no bond coeff for type {t}")
            bond_r0[int(t)] = float(c[1])  # harmonic (K, r0)

        sel_angles = np.zeros((0, 4), dtype=bl.dtype)
        angle_theta0 = {}
        asel = None
        if atypes and raw.get("angles") is not None:
            al = np.asarray(raw["angles"]).copy()
            al[:, 1:] -= 1
            asel = np.isin(al[:, 0], atypes)
            if spec.group != "all" and self._group_defs:
                asel &= (ing[al[:, 1]] & ing[al[:, 2]] & ing[al[:, 3]])
            sel_angles = al[asel]
            for t in atypes:
                c = self.angle_coeffs.get(int(t))
                if c is None:
                    raise ScriptError(f"fix shake: no angle coeff {t}")
                angle_theta0[int(t)] = float(c[1]) * np.pi / 180.0

        from .integrate.shake import (make_rattle_clusters,
                                      make_shake_clusters)

        units = get_units(self.units_name)
        dt_step = self.dt if self.dt is not None else units.dt
        mk = (make_rattle_clusters if spec.style == "rattle"
              else make_shake_clusters)
        fix = mk(
            cap, sel_bonds, bond_r0,
            angles=sel_angles if len(sel_angles) else None,
            angle_theta0=angle_theta0,
            tol=float(spec.args[0]), max_iter=int(spec.args[1]),
            dt=dt_step, ftm2v=units.ftm2v,
            dtype=jnp.float64 if self.dtype == jnp.float64 else self.dtype,
        )

        # remove constrained terms from the force topology (type -> 0 rows
        # are masked by the bonded compute)
        new_bonds = bonds.copy()
        new_bonds[sel, 0] = 0
        self.topology_raw = dict(self.topology_raw)
        self.topology_raw["bonds"] = new_bonds
        if asel is not None:
            new_angles = np.asarray(raw["angles"]).copy()
            new_angles[asel, 0] = 0
            self.topology_raw["angles"] = new_angles
        return fix

    def _build_fixes(self, state=None):
        from .integrate.fixes import (
            FixAddForce, FixEnforce2D, FixLangevin, FixMomentum, FixRecenter,
            FixSetForce, FixSpring, FixViscous,
        )
        from .integrate.nh import FixNPH, FixNPT, FixNVT
        from .integrate.verlet import Integrator

        units = get_units(self.units_name)
        dt = self.dt if self.dt is not None else units.dt
        integ = None
        fixes = []
        for f in self.fixes:
            gbit = self.groups.get(f.group, 1)
            if f.style == "nve":
                integ = Integrator(dt=dt, units=units, groupbit=gbit)
            elif f.style == "nvt":
                kw = self._nh_kw(f.args)
                kw.pop("mtk", None)  # barostat-only keyword (fix_nh.cpp)
                integ = FixNVT(dt=dt, units=units, groupbit=gbit, **kw)
            elif f.style in ("nvt/sllod", "nvt/sllod/psllod"):
                from .integrate.nh import FixNVTSllod

                kw = self._nh_kw(f.args)
                kw.pop("mtk", None)
                psllod = False
                args = list(f.args)
                if "psllod" in args:
                    psllod = args[args.index("psllod") + 1] == "yes"
                integ = FixNVTSllod(dt=dt, units=units, groupbit=gbit,
                                    psllod=psllod, **kw)
            elif f.style in ("npt", "nph"):
                kw = self._nh_kw(f.args)
                cls = FixNPT if f.style == "npt" else FixNPH
                integ = cls(dt=dt, units=units, groupbit=gbit, **kw)
            elif f.style == "nve/sphere":
                from .integrate.sphere import IntegratorNVESphere

                upd = "none"
                if "update" in f.args:
                    upd = f.args[f.args.index("update") + 1]
                integ = IntegratorNVESphere(dt=dt, units=units,
                                            groupbit=gbit, update_style=upd)
            elif f.style in ("nvt/sphere", "npt/sphere", "nph/sphere"):
                from .integrate.sphere import (
                    FixNPHSphere, FixNPTSphere, FixNVTSphere,
                )

                kw = self._nh_kw(f.args)
                cls = {"nvt/sphere": FixNVTSphere,
                       "npt/sphere": FixNPTSphere,
                       "nph/sphere": FixNPHSphere}[f.style]
                if cls is FixNVTSphere:
                    kw.pop("mtk", None)
                integ = cls(dt=dt, units=units, groupbit=gbit, **kw)
            elif f.style == "langevin":
                fixes.append(FixLangevin(
                    t_start=float(f.args[0]), t_stop=float(f.args[1]),
                    t_period=float(f.args[2]), seed=int(f.args[3]),
                    dt=dt, units=units, groupbit=gbit,
                ))
            elif f.style == "setforce":
                fc = self._fix_component
                fixes.append(FixSetForce(fx=fc(f.args[0]), fy=fc(f.args[1]),
                                         fz=fc(f.args[2]), groupbit=gbit,
                                         region=self._fix_region_kw(f.args)))
            elif f.style == "addforce":
                fc = self._fix_component
                fixes.append(FixAddForce(fx=fc(f.args[0]),
                                         fy=fc(f.args[1]),
                                         fz=fc(f.args[2]), groupbit=gbit))
            elif f.style == "momentum":
                args = f.args
                linear = None
                angular = "angular" in args
                rescale = "rescale" in args
                if "linear" in args:
                    li = args.index("linear")
                    linear = tuple(bool(int(args[li + 1 + d]))
                                   for d in range(3))
                if angular or rescale:
                    from .integrate.fixes import FixMomentumFull

                    fixes.append(FixMomentumFull(
                        every=int(args[0]), groupbit=gbit, linear=linear,
                        angular=angular, rescale=rescale))
                else:
                    fixes.append(FixMomentum(
                        every=int(args[0]), groupbit=gbit,
                        linear=linear or (True, True, True)))
            elif f.style == "python/move":
                import importlib
                import os
                import sys as _sys

                from .integrate.pymove import (
                    IntegratorPythonMove, PyMoveAPI, install_lammps_shim,
                )

                install_lammps_shim()
                modname, _, clsname = f.args[0].rpartition(".")
                for d in (getattr(self, "_last_file_dir", None),
                          self.variables.get("input_dir")):
                    if d and os.path.isdir(d) and d not in _sys.path:
                        _sys.path.insert(0, d)
                cls = getattr(importlib.import_module(modname), clsname)
                api = PyMoveAPI(dt, units, self._mass_table(),
                                self.ntypes)
                integ = IntegratorPythonMove(
                    dt=dt, units=units, groupbit=gbit,
                    pyobj=cls(api), api=api, nlocal=len(self.types))
            elif f.style == "nve/limit":
                from .integrate.verlet import IntegratorNVELimit

                integ = IntegratorNVELimit(dt=dt, units=units,
                                           groupbit=gbit,
                                           xmax=float(f.args[0]))
            elif f.style == "nve/noforce":
                from .integrate.verlet import IntegratorNVENoforce

                integ = IntegratorNVENoforce(dt=dt, units=units,
                                             groupbit=gbit)
            elif f.style == "aveforce":
                from .integrate.fixes import FixAveForce

                fc = self._fix_component
                fixes.append(FixAveForce(fx=fc(f.args[0]), fy=fc(f.args[1]),
                                         fz=fc(f.args[2]), groupbit=gbit,
                                         region=self._fix_region_kw(f.args)))
            elif f.style == "spring/self":
                from .integrate.fixes import FixSpringSelf

                fixes.append(FixSpringSelf(k=float(f.args[0]),
                                           groupbit=gbit))
            elif f.style == "temp/rescale":
                from .integrate.fixes import FixTempRescale

                fixes.append(FixTempRescale(
                    every=int(f.args[0]), t_start=float(f.args[1]),
                    t_stop=float(f.args[2]), window=float(f.args[3]),
                    fraction=float(f.args[4]), units=units, groupbit=gbit))
            elif f.style == "temp/berendsen":
                from .integrate.fixes import FixTempBerendsen

                fixes.append(FixTempBerendsen(
                    t_start=float(f.args[0]), t_stop=float(f.args[1]),
                    t_period=float(f.args[2]), dt=dt, units=units,
                    groupbit=gbit))
            elif f.style in ("temp/csvr", "temp/csld"):
                import numpy as _np

                from .integrate.fixes import FixTempCSLD, FixTempCSVR

                st = state if state is not None else self.sim.state
                g = _np.asarray(st.valid_mask) & _np.asarray(
                    st.group_mask(gbit))
                dim = 3 if getattr(st, "dimension", 3) == 3 else 2
                dof = dim * int(g.sum()) - dim
                cls = (FixTempCSVR if f.style == "temp/csvr"
                       else FixTempCSLD)
                fixes.append(cls(
                    t_start=float(f.args[0]), t_stop=float(f.args[1]),
                    t_period=float(f.args[2]), seed=int(f.args[3]),
                    dof=dof, dt=dt, units=units, groupbit=gbit))
            elif f.style in ("planeforce", "lineforce"):
                from .integrate.fixes import FixLineForce, FixPlaneForce

                cls = (FixPlaneForce if f.style == "planeforce"
                       else FixLineForce)
                fixes.append(cls(nx=float(f.args[0]), ny=float(f.args[1]),
                                 nz=float(f.args[2]), groupbit=gbit))
            elif f.style.startswith("wall/") and f.style[5:] in (
                    "lj93", "lj126", "lj1043", "harmonic", "morse"):
                from .integrate.fixes import FixWall

                wstyle = f.style[5:]
                walls = []
                i = 0
                a = f.args
                while i < len(a):
                    face = a[i]
                    if face not in ("xlo", "xhi", "ylo", "yhi",
                                    "zlo", "zhi"):
                        i += 1  # trailing keyword (units/pbc) — skip
                        continue
                    coord = float("nan") if a[i + 1] == "EDGE" \
                        else float(a[i + 1])
                    if wstyle == "morse":
                        # face coord D alpha r0 cutoff
                        walls.append((face, coord, float(a[i + 2]),
                                      float(a[i + 4]), float(a[i + 3]),
                                      float(a[i + 5])))
                        i += 6
                    else:
                        # face coord eps sigma cutoff
                        walls.append((face, coord, float(a[i + 2]),
                                      float(a[i + 3]), 0.0,
                                      float(a[i + 4])))
                        i += 5
                fixes.append(FixWall(style=wstyle, walls=tuple(walls),
                                     groupbit=gbit))
            elif f.style == "enforce2d":
                fixes.append(FixEnforce2D(groupbit=gbit))
            elif f.style == "viscous":
                fixes.append(FixViscous(gamma=float(f.args[0]),
                                        groupbit=gbit))
            elif f.style == "spring":
                if f.args[0] == "tether":
                    fixes.append(FixSpring(
                        k=float(f.args[1]),
                        x0=tuple(None if s == "NULL" else float(s)
                                 for s in f.args[2:5]),
                        r0=float(f.args[5]) if len(f.args) > 5 else 0.0,
                        groupbit=gbit))
                elif f.args[0] == "couple":
                    from .integrate.fixes import FixSpringCouple

                    fixes.append(FixSpringCouple(
                        k=float(f.args[2]),
                        group2bit=self.groups.get(f.args[1], 1),
                        x0=tuple(None if s == "NULL" else float(s)
                                 for s in f.args[3:6]),
                        r0=float(f.args[6]), groupbit=gbit))
                else:
                    raise ScriptError(f"fix spring {f.args[0]}")
            elif f.style == "spring/rg":
                from .integrate.fixes import FixSpringRG

                fixes.append(FixSpringRG(
                    k=float(f.args[0]),
                    rg0=None if f.args[1] == "NULL" else float(f.args[1]),
                    groupbit=gbit))
            elif f.style == "efield":
                from .integrate.fixes import FixEfield

                q = units.qe2f
                fc = self._fix_component
                fixes.append(FixEfield(
                    ex=fc(f.args[0], q), ey=fc(f.args[1], q),
                    ez=fc(f.args[2], q), groupbit=gbit,
                    region=self._fix_region_kw(f.args)))
            elif f.style == "efield/tip4p":
                import math as _math

                from .integrate.fixes import FixEfieldTIP4P

                # tip4p pair styles carry typeO typeH typeB typeA qdist
                # as their first five args (ref: pair_tip4p_cut.cpp
                # settings; fix reads them via pair->extract,
                # fix_efield_tip4p.cpp:53-76)
                pw = self.pair_style_words or []
                typeO, typeH = int(pw[1]), int(pw[2])
                typeB, typeA = int(pw[3]), int(pw[4])
                qdist = float(pw[5])
                blen = float(self.bond_coeffs[typeB][1])
                theta = float(self.angle_coeffs[typeA][1]) * _math.pi / 180.0
                alpha = qdist / (_math.cos(0.5 * theta) * blen)
                tv = np.asarray(self.types, dtype=np.int64)
                cap = (state.capacity if state is not None
                       else self.sim.state.capacity)
                osrc = np.arange(cap, dtype=np.int32)
                for i in np.nonzero(tv == typeO)[0]:
                    if (i + 2 < len(tv) and tv[i + 1] == typeH
                            and tv[i + 2] == typeH):
                        osrc[i + 1] = i
                        osrc[i + 2] = i
                fc = self._fix_component
                q = units.qe2f
                fixes.append(FixEfieldTIP4P(
                    ex=fc(f.args[0], q), ey=fc(f.args[1], q),
                    ez=fc(f.args[2], q), alpha=alpha, groupbit=gbit,
                    osrc=osrc))
            elif f.style == "drag":
                from .integrate.fixes import FixDrag

                fixes.append(FixDrag(
                    pt=tuple(None if s == "NULL" else float(s)
                             for s in f.args[0:3]),
                    fmag=float(f.args[3]), delta=float(f.args[4]),
                    groupbit=gbit))
            elif f.style == "oneway":
                from .integrate.fixes import FixOneway

                d = f.args[2]
                fixes.append(FixOneway(
                    nevery=int(f.args[0]),
                    region=self._region_match(f.args[1]),
                    dim={"x": 0, "y": 1, "z": 2}[d[-1]],
                    minus=d.startswith("-"), groupbit=gbit))
            elif f.style == "heat":
                from .integrate.fixes import FixHeat

                fixes.append(FixHeat(
                    nevery=int(f.args[0]), flux=float(f.args[1]),
                    ftm2v=units.ftm2v, dt=dt, groupbit=gbit,
                    region=self._fix_region_kw(f.args)))
            elif f.style == "smd":
                from .integrate.fixes import FixSMD

                a = list(f.args)
                kw2 = dict(dt=dt, groupbit=gbit)
                i = 0
                if a[i] == "cvel":
                    kw2.update(cvel=True, k=float(a[i + 1]),
                               v=float(a[i + 2]))
                    i += 3
                else:  # cfor
                    kw2.update(cvel=False, fmag=float(a[i + 1]))
                    i += 2
                if a[i] == "tether":
                    pt = tuple(None if s == "NULL" else float(s)
                               for s in a[i + 1:i + 4])
                    kw2.update(couple=False, pt=pt, r0=float(a[i + 4]))
                else:  # couple
                    g2 = self.groups.get(a[i + 1], 1)
                    pt = tuple(None if s == "NULL"
                               else ("auto" if s == "auto" else float(s))
                               for s in a[i + 2:i + 5])
                    kw2.update(couple=True, group2bit=g2, pt=pt,
                               r0=float(a[i + 5]))
                fixes.append(FixSMD(**kw2))
            elif f.style == "deform":
                from .integrate.fixes import FixDeform

                a = list(f.args)
                nev = int(a[0])
                dims = [(None, 0.0, 0.0)] * 3
                tilts = [(None, 0.0, 0.0)] * 3
                remap = True
                i = 1
                dmap = {"x": 0, "y": 1, "z": 2}
                tmap = {"xy": 0, "xz": 1, "yz": 2}
                while i < len(a):
                    if a[i] in tmap:
                        d = tmap[a[i]]
                        sty = a[i + 1]
                        if sty in ("final", "delta", "erate"):
                            tilts[d] = (sty, float(a[i + 2]), 0.0)
                            i += 3
                        else:
                            raise ScriptError(f"deform tilt style {sty}")
                    elif a[i] in dmap:
                        d = dmap[a[i]]
                        sty = a[i + 1]
                        if sty in ("final", "delta"):
                            dims[d] = (sty, float(a[i + 2]),
                                       float(a[i + 3]))
                            i += 4
                        elif sty in ("scale", "vel", "erate", "trate"):
                            dims[d] = ("scale" if sty == "trate" else sty,
                                       float(a[i + 2]), 0.0)
                            i += 3
                        else:
                            raise ScriptError(f"deform style {sty}")
                    elif a[i] == "remap":
                        remap = a[i + 1] == "x"
                        i += 2
                    elif a[i] == "units":
                        i += 2
                    else:
                        i += 1
                fixes.append(FixDeform(nevery=nev, dims=tuple(dims),
                                       tilts=tuple(tilts),
                                       remap=remap, dt=dt, groupbit=gbit))
            elif f.style == "restrain":
                from .integrate.fixes import FixRestrain

                a = list(f.args)
                bonds, angles, dihedrals = [], [], []
                i = 0
                while i < len(a):
                    w = a[i]
                    if w in ("bond", "lbound"):
                        bonds.append((int(a[i + 1]) - 1, int(a[i + 2]) - 1,
                                      float(a[i + 3]), float(a[i + 4]),
                                      float(a[i + 5]), float(a[i + 6]),
                                      w == "lbound"))
                        i += 7
                    elif w == "angle":
                        angles.append((int(a[i + 1]) - 1, int(a[i + 2]) - 1,
                                       int(a[i + 3]) - 1,
                                       float(a[i + 4]), float(a[i + 5]),
                                       float(a[i + 6]) * np.pi / 180.0))
                        i += 7
                    elif w == "dihedral":
                        dihedrals.append([int(a[i + 1]) - 1,
                                          int(a[i + 2]) - 1,
                                          int(a[i + 3]) - 1,
                                          int(a[i + 4]) - 1,
                                          float(a[i + 5]), float(a[i + 6]),
                                          float(a[i + 7]) * np.pi / 180.0,
                                          1])
                        i += 8
                    elif w == "mult":
                        dihedrals[-1][7] = int(a[i + 1])
                        i += 2
                    else:
                        i += 1
                fixes.append(FixRestrain(
                    bonds=tuple(tuple(b) for b in bonds),
                    angles=tuple(tuple(x) for x in angles),
                    dihedrals=tuple(tuple(x) for x in dihedrals),
                    groupbit=gbit))
            elif f.style == "addtorque":
                from .integrate.fixes import FixAddTorque

                fc = self._fix_component
                fixes.append(FixAddTorque(
                    tx=fc(f.args[0]), ty=fc(f.args[1]),
                    tz=fc(f.args[2]), mvv2e=units.mvv2e,
                    groupbit=gbit))
            elif f.style == "momentum/chunk":
                from .integrate.fixes import FixMomentumChunk

                a = list(f.args)
                nmol = int(max(self.molecules)) if self.molecules else 0
                kw2 = dict(nevery=int(a[0]), nchunk=nmol, groupbit=gbit)
                if "linear" in a:
                    li = a.index("linear")
                    kw2["linear"] = tuple(bool(int(a[li + 1 + d]))
                                          for d in range(3))
                else:
                    kw2["linear"] = (False, False, False)
                kw2["angular"] = "angular" in a
                kw2["rescale"] = "rescale" in a
                fixes.append(FixMomentumChunk(**kw2))
            elif f.style == "spring/chunk":
                from .integrate.fixes import FixSpringChunk

                nmol = int(max(self.molecules)) if self.molecules else 0
                fixes.append(FixSpringChunk(
                    k=float(f.args[0]), nchunk=nmol, groupbit=gbit))
            elif f.style == "store/state":
                from .integrate.fixes import FixStoreState

                keys = tuple(k for k in f.args[1:]
                             if k in ("x", "y", "z", "fx", "fy", "fz",
                                      "vx", "vy", "vz", "xu", "yu", "zu"))
                fixes.append(FixStoreState(
                    fid=f.fid, keys=keys, groupbit=gbit))
            elif f.style == "adapt":
                from .integrate.fixes import FixAdapt
                from .utils.stepexpr import compile_equal

                a = list(f.args)
                nev = int(a[0])
                if a[1] != "pair":
                    raise ScriptError("fix adapt: only pair adapts wired")
                attr = a[3]
                if a[4] != "*" or a[5] != "*":
                    raise ScriptError("fix adapt needs uniform * * scope")
                vname = a[6][2:]
                fn = compile_equal(self._equal_vars[vname])
                if attr == "epsilon":
                    # uniform scope: epsilon0 from the last * * coeff
                    base = None
                    for c in self.pair_coeffs:
                        if c[0] == "*" and c[1] == "*":
                            base = float(c[2])
                    if base is None:
                        raise ScriptError(
                            "fix adapt epsilon needs a * * pair_coeff")
                elif attr == "scale":
                    base = 1.0
                else:
                    raise ScriptError(f"fix adapt attr {attr}")
                fixes.append(FixAdapt(fn=fn, base=base, nevery=nev,
                                      kspace="kspace" in a,
                                      groupbit=gbit))
            elif f.style == "wall/table":
                from .integrate.fixes import FixWallTable, build_wall_table

                a = list(f.args)
                spline = a[0] == "spline"
                tablength = int(a[1])
                walls, tables = [], []
                i = 2
                faces = {"xlo": (0, -1), "xhi": (0, 1), "ylo": (1, -1),
                         "yhi": (1, 1), "zlo": (2, -1), "zhi": (2, 1)}
                while i < len(a):
                    if a[i] in faces:
                        dim, side = faces[a[i]]
                        coordw = a[i + 1]
                        if coordw == "EDGE":
                            coord = float((self._box_lo_np
                                           if side < 0
                                           else self._box_hi_np)[dim])
                        else:
                            coord = float(coordw)
                        fname = self._substitute(a[i + 2])                             if hasattr(self, "_substitute") else a[i + 2]
                        section = a[i + 3]
                        cutoff = float(a[i + 4])
                        tables.append(build_wall_table(
                            fname, section, tablength, cutoff))
                        walls.append((dim, side, coord, cutoff))
                        i += 5
                    else:
                        i += 1
                fixes.append(FixWallTable(
                    fid=f.fid, walls=tuple(walls), spline=spline,
                    tables=tuple(tables), groupbit=gbit))
            elif f.style == "wall/lepton":
                from .integrate.fixes import FixWallLepton

                a = list(f.args)
                faces = {"xlo": (0, -1), "xhi": (0, 1), "ylo": (1, -1),
                         "yhi": (1, 1), "zlo": (2, -1), "zhi": (2, 1)}
                walls = []
                i = 0
                while i < len(a):
                    if a[i] in faces:
                        dim, side = faces[a[i]]
                        coordw = a[i + 1]
                        if coordw == "EDGE":
                            coord = float((self._box_lo_np
                                           if side < 0
                                           else self._box_hi_np)[dim])
                        else:
                            coord = float(coordw)
                        expr = a[i + 2].strip("\"'")
                        cutoff = float(a[i + 3])
                        walls.append((dim, side, coord, cutoff, expr))
                        i += 4
                    else:
                        i += 1
                fixes.append(FixWallLepton(
                    walls=tuple(walls), groupbit=gbit))
            elif f.style == "wall/region":
                from .integrate.fixes import FixWallRegion

                rname, wstyle = f.args[0], f.args[1]
                if wstyle != "harmonic":
                    raise ScriptError(
                        f"wall/region style {wstyle} not wired")
                style_r, pr, _, _ = self.regions[rname]
                if style_r not in ("block", "prism"):
                    raise ScriptError("wall/region needs a block region")
                lo, hi = self._region_bbox(rname)
                fixes.append(FixWallRegion(
                    lo=tuple(float(v) for v in lo),
                    hi=tuple(float(v) for v in hi),
                    epsilon=float(f.args[2]), sigma=float(f.args[3]),
                    cutoff=float(f.args[4]), groupbit=gbit))
            elif f.style == "press/berendsen":
                from .integrate.fixes import FixPressBerendsen

                a = list(f.args)
                kw2 = dict(units_obj=units, dt=dt, groupbit=gbit)
                i = 0
                while i < len(a):
                    if a[i] in ("iso", "aniso"):
                        kw2.update(p_start=float(a[i + 1]),
                                   p_stop=float(a[i + 2]),
                                   p_period=float(a[i + 3]))
                        i += 4
                    elif a[i] == "modulus":
                        kw2.update(bulkmodulus=float(a[i + 1]))
                        i += 2
                    else:
                        i += 2
                fixes.append(FixPressBerendsen(**kw2))
            elif f.style == "recenter":
                fixes.append(FixRecenter(groupbit=gbit))
            elif f.style in ("shake", "rattle"):
                pass  # materialized by _build_shake (needs topology)
            elif f.style.split("/")[0] == "rigid":
                pass  # materialized by _build_rigid (needs state)
            elif f.style == "move":
                from .integrate.move import IntegratorMove

                a = list(f.args)
                ms = a[0]

                def nv(s):
                    return None if s == "NULL" else float(s)

                if ms == "linear":
                    integ = IntegratorMove(
                        dt=dt, units=units, groupbit=gbit, style=ms,
                        vel=(nv(a[1]), nv(a[2]), nv(a[3])),
                        time_origin=self.ntimestep)
                elif ms == "wiggle":
                    integ = IntegratorMove(
                        dt=dt, units=units, groupbit=gbit, style=ms,
                        amp=(nv(a[1]), nv(a[2]), nv(a[3])),
                        period=float(a[4]), time_origin=self.ntimestep)
                elif ms == "rotate":
                    integ = IntegratorMove(
                        dt=dt, units=units, groupbit=gbit, style=ms,
                        point=tuple(float(s) for s in a[1:4]),
                        axis=tuple(float(s) for s in a[4:7]),
                        period=float(a[7]), time_origin=self.ntimestep)
                elif ms == "variable":
                    fc = self._fix_component
                    integ = IntegratorMove(
                        dt=dt, units=units, groupbit=gbit, style=ms,
                        dvars=tuple(fc(s) for s in a[1:4]),
                        vvars=tuple(fc(s) for s in a[4:7]),
                        time_origin=self.ntimestep)
                elif ms == "transrot":
                    integ = IntegratorMove(
                        dt=dt, units=units, groupbit=gbit, style=ms,
                        vel=(nv(a[1]), nv(a[2]), nv(a[3])),
                        point=tuple(float(s) for s in a[4:7]),
                        axis=tuple(float(s) for s in a[7:10]),
                        period=float(a[10]), time_origin=self.ntimestep)
                else:
                    raise ScriptError(f"fix move {ms} unsupported")
            elif f.style == "sph":
                # group-scoped velocity-Verlet + vest extrapolation; rho
                # needs no time integration under summation density
                # (ref: src/SPH/fix_sph.cpp; models/pair_sph.py design note)
                from .integrate.verlet import IntegratorSPH

                integ = IntegratorSPH(dt=dt, units=units, groupbit=gbit)
            elif f.style == "sph/stationary":
                pass  # no x/v update; rho re-summed every step anyway
            elif f.style == "gravity":
                from .integrate.fixes import FixGravity

                mag = float(f.args[0])
                kw = {}
                if "vector" in f.args:
                    vi = f.args.index("vector")
                    kw = dict(vx=float(f.args[vi + 1]),
                              vy=float(f.args[vi + 2]),
                              vz=float(f.args[vi + 3]))
                elif "chute" in f.args:
                    # chute: phi=0, theta=180-angle (fix_gravity.cpp:326)
                    import math as _m

                    th = _m.radians(180.0 - float(
                        f.args[f.args.index("chute") + 1]))
                    kw = dict(vx=_m.sin(th), vy=0.0, vz=_m.cos(th))
                fixes.append(FixGravity(g=mag, groupbit=gbit, **kw))
            elif f.style == "freeze":
                from .integrate.fixes import FixFreeze

                fixes.append(FixFreeze(groupbit=gbit))
            else:
                raise ScriptError(f"fix style {f.style} unsupported")
        if integ is None:
            integ = Integrator(dt=dt, units=units)
        return integ, tuple(fixes)

    def _fix_component(self, s, scale: float = 1.0):
        """Resolve a fix argument that may be NULL, a number, or v_<name>
        referencing an equal- or atom-style variable (ref: utils::numeric
        vs variable hooks in fix ctors). Returns None, a float, or a
        traced-value spec consumed by integrate.fixes._fix_value."""
        if s == "NULL":
            return None
        if isinstance(s, str) and s.startswith("v_"):
            name = s[2:]
            if hasattr(self, "_atom_vars") and name in self._atom_vars:
                expr = self._atom_vars[name].strip()
                import re

                m = re.fullmatch(r"f_(\w+)\[(\d+)\]", expr)
                if not m:
                    raise ScriptError(f"atom variable '{expr}' unsupported")
                return ("atom", f"store_{m.group(1)}",
                        int(m.group(2)) - 1, scale)
            if name in self._equal_vars:
                import re as _re

                from .utils.stepexpr import compile_equal

                expr = self._equal_vars[name]
                # inline nested v_<name> references
                for _ in range(5):
                    expr2 = _re.sub(
                        r"v_(\w+)",
                        lambda mm: "(" + self._equal_vars[mm.group(1)]
                        + ")",
                        expr)
                    if expr2 == expr:
                        break
                    expr = expr2
                units = get_units(self.units_name)
                dtv = self.dt if self.dt is not None else units.dt
                return ("equal", compile_equal(expr, dt=dtv), scale, dtv)
            raise ScriptError(f"fix references undefined variable {name}")
        return float(s) * scale

    def _nh_kw(self, args: list[str]) -> dict:
        """fix nvt/npt/nph keyword parse (ref: FixNH::FixNH arg loop,
        src/fix_nh.cpp:96-330 — temp, iso/aniso, per-dim x/y/z couplings,
        tchain/pchain, mtk, drag)."""
        kw = {}
        dims = {"x": 0, "y": 1, "z": 2}
        i = 0
        while i < len(args):
            k = args[i]
            if k == "temp":
                kw["t_start"] = float(args[i + 1])
                kw["t_stop"] = float(args[i + 2])
                kw["t_period"] = float(args[i + 3])
                i += 4
            elif k in ("iso", "aniso"):
                p0, p1, pp = (float(args[i + 1]), float(args[i + 2]),
                              float(args[i + 3]))
                kw["p_start"] = (p0,) * 3 + (0.0,) * 3
                kw["p_stop"] = (p1,) * 3 + (0.0,) * 3
                kw["p_period"] = (pp,) * 3 + (1.0,) * 3
                kw["pcouple"] = "iso" if k == "iso" else "aniso"
                i += 4
            elif k == "tri":
                p0, p1, pp = (float(args[i + 1]), float(args[i + 2]),
                              float(args[i + 3]))
                kw["p_start"] = (p0,) * 3 + (0.0,) * 3
                kw["p_stop"] = (p1,) * 3 + (0.0,) * 3
                kw["p_period"] = (pp,) * 6
                kw["p_flag"] = (True,) * 6
                kw["pcouple"] = "aniso"
                i += 4
            elif k in dims:
                d = dims[k]
                ps = list(kw.get("p_start", (0.0,) * 3))
                pe = list(kw.get("p_stop", (0.0,) * 3))
                pp = list(kw.get("p_period", (1.0,) * 3))
                fl = list(kw.get("p_flag", (False,) * 3))
                ps[d] = float(args[i + 1])
                pe[d] = float(args[i + 2])
                pp[d] = float(args[i + 3])
                fl[d] = True
                kw["p_start"] = tuple(ps)
                kw["p_stop"] = tuple(pe)
                kw["p_period"] = tuple(pp)
                kw["p_flag"] = tuple(fl)
                kw["pcouple"] = "aniso"  # per-dim = uncoupled (couple none)
                i += 4
            elif k == "tchain":
                kw["mtchain"] = int(args[i + 1]); i += 2
            elif k == "pchain":
                kw["mpchain"] = int(args[i + 1]); i += 2
            elif k == "mtk":
                kw["mtk"] = args[i + 1] == "yes"; i += 2
            elif k == "drag":
                kw["drag"] = float(args[i + 1]); i += 2
            elif k == "couple":
                c = args[i + 1]
                kw["pcouple"] = {"xyz": "iso", "none": "aniso"}.get(c, c)
                i += 2
            elif k == "dilate":
                g = args[i + 1]
                if g == "all":
                    kw["dilate_all"] = True
                else:
                    kw["dilate_all"] = False
                    kw["dilate_groupbit"] = self.groups.get(g, 1)
                i += 2
            elif k == "ptemp":
                kw["p_temp"] = float(args[i + 1]); i += 2
            elif k == "fixedpoint":
                kw["fixed_point"] = (float(args[i + 1]), float(args[i + 2]),
                                     float(args[i + 3]))
                i += 4
            elif k in ("flip", "scalexy", "scalexz", "scaleyz"):
                i += 2  # recorded-and-ignored (ortho box path)
            elif k == "nreset":
                i += 2  # h0 reference reset: no strain-energy term yet
            else:
                i += 1
        return kw
