"""LAMMPS data-file reader (`read_data` subset).

Host-side setup code parsing the standard data format
(ref: src/read_data.cpp:58-70 section list, SURVEY.md §A.8): header with
counts/types/box bounds (+tilt), then Masses, Atoms (styles atomic/charge/
bond/angle/molecular/full), Velocities, Bonds, Angles, Dihedrals,
Impropers, and coeff sections (stored raw for the style builders).
"""

from __future__ import annotations

import dataclasses

import numpy as np

_SECTIONS = {
    "Masses", "Atoms", "Velocities", "Bonds", "Angles", "Dihedrals",
    "Impropers", "Pair Coeffs", "PairIJ Coeffs", "Bond Coeffs",
    "Angle Coeffs", "Dihedral Coeffs", "Improper Coeffs",
    "BondBond Coeffs", "BondAngle Coeffs", "MiddleBondTorsion Coeffs",
    "EndBondTorsion Coeffs", "AngleTorsion Coeffs", "AngleAngleTorsion Coeffs",
    "BondBond13 Coeffs", "AngleAngle Coeffs",
}

_HEADER_KEYS = [
    ("atoms", "natoms"), ("bonds", "nbonds"), ("angles", "nangles"),
    ("dihedrals", "ndihedrals"), ("impropers", "nimpropers"),
    ("atom types", "natomtypes"), ("bond types", "nbondtypes"),
    ("angle types", "nangletypes"), ("dihedral types", "ndihedraltypes"),
    ("improper types", "nimpropertypes"),
]


@dataclasses.dataclass
class DataFile:
    natoms: int = 0
    nbonds: int = 0
    nangles: int = 0
    ndihedrals: int = 0
    nimpropers: int = 0
    natomtypes: int = 0
    nbondtypes: int = 0
    nangletypes: int = 0
    ndihedraltypes: int = 0
    nimpropertypes: int = 0
    xlo: float = 0.0
    xhi: float = 0.0
    ylo: float = 0.0
    yhi: float = 0.0
    zlo: float = 0.0
    zhi: float = 0.0
    xy: float = 0.0
    xz: float = 0.0
    yz: float = 0.0
    masses: np.ndarray | None = None  # [natomtypes+1]
    # per-atom (in tag order, tags must be 1..N after sorting)
    tags: np.ndarray | None = None
    # tags in data-file line order — the reference's local atom order on
    # one rank (read_data.cpp appends in file order); stochastic fixes
    # that consume RNG draws per-atom need this order for stream parity
    file_order: np.ndarray | None = None
    types: np.ndarray | None = None
    molecule: np.ndarray | None = None
    q: np.ndarray | None = None
    x: np.ndarray | None = None
    image: np.ndarray | None = None
    v: np.ndarray | None = None
    # topology in TAG space: [N, width] (type, tag1, tag2, ...)
    bonds: np.ndarray | None = None
    angles: np.ndarray | None = None
    dihedrals: np.ndarray | None = None
    impropers: np.ndarray | None = None
    # SPH per-atom fields (atom_style sph, ref: src/SPH/atom_vec_sph.cpp)
    sph_rho: np.ndarray | None = None
    sph_e: np.ndarray | None = None
    sph_cv: np.ndarray | None = None
    # reference positions (fork atom styles x0image / full/sph/x0image,
    # ref: src/atom_vec_x0image.cpp fields_data_atom {id,type,x0,x};
    # src/atom_vec_full_sph_x0image.cpp {id,molecule,type,q,rho,esph,cv,
    # x0,x}) — the RBC membrane styles' rest configuration
    x0: np.ndarray | None = None
    # finite-size / dipole per-atom fields (atom styles sphere + dipole,
    # ref: src/atom_vec_sphere.cpp data_atom: diameter density ->
    # radius + rmass; src/DIPOLE/atom_vec_dipole.cpp: mux muy muz)
    radius: np.ndarray | None = None
    rmass: np.ndarray | None = None
    mu: np.ndarray | None = None      # [N, 3]
    omega: np.ndarray | None = None   # [N, 3] from 6-col Velocities
    # raw coeff sections keyed by section name -> list of token rows
    coeffs: dict = dataclasses.field(default_factory=dict)


def _strip(line: str) -> str:
    i = line.find("#")
    if i >= 0:
        line = line[:i]
    return line.strip()


def _scan_coeff_sections(df: "DataFile", path: str) -> None:
    """Collect raw `* Coeffs` section rows (the native parser handles the
    big per-atom payloads; coeff sections are tiny and style-specific)."""
    cur = None
    with open(path) as f:
        next(f, None)  # title
        for line in f:
            s = _strip(line)
            if not s:
                continue
            if s in _SECTIONS:
                cur = s if s.endswith("Coeffs") else None
                continue
            if cur is not None:
                df.coeffs.setdefault(cur, []).append(s.split())


def _scan_file_order(path: str, natoms: int) -> np.ndarray | None:
    """Light second pass recording the Atoms-section tag order (the
    reference's local atom order on one rank; stochastic fixes replay
    RNG draws in it — see DataFile.file_order)."""
    order = np.empty(natoms, dtype=np.int64)
    k = 0
    in_atoms = False
    with open(path) as f:
        for line in f:
            s = line.split("#")[0].strip()
            if not in_atoms:
                if s == "Atoms" or s.startswith("Atoms "):
                    in_atoms = True
                continue
            if not s:
                if k:  # trailing blank ends the section
                    break
                continue
            try:
                order[k] = int(s.split(None, 1)[0])
            except (ValueError, IndexError):
                break
            k += 1
            if k == natoms:
                break
    return order if k == natoms else None


def read_data(path: str, atom_style: str = "full",
              use_native: bool = True) -> DataFile:
    if (atom_style.startswith("hybrid") or atom_style == "sphere"
            or "x0image" in atom_style):
        use_native = False  # hybrid/sphere/x0image layouts: python path only
    if use_native:
        from .native import read_data_native

        df = read_data_native(path, atom_style)
        if df is not None:
            _scan_coeff_sections(df, path)
            df.file_order = _scan_file_order(path, df.natoms)
            return df
    with open(path) as f:
        lines = f.read().splitlines()

    df = DataFile()
    # header: everything until the first recognized section keyword
    i = 1  # skip title line
    while i < len(lines):
        raw = lines[i].strip()
        name = _strip(lines[i])
        if raw.split("#")[0].strip() in _SECTIONS or name in _SECTIONS:
            break
        s = name
        if s:
            parts = s.split()
            matched = False
            for key, attr in _HEADER_KEYS:
                kl = key.split()
                if parts[len(parts) - len(kl):] == kl and len(parts) > len(kl):
                    setattr(df, attr, int(parts[0]))
                    matched = True
                    break
            if not matched:
                if s.endswith("xlo xhi"):
                    df.xlo, df.xhi = float(parts[0]), float(parts[1])
                elif s.endswith("ylo yhi"):
                    df.ylo, df.yhi = float(parts[0]), float(parts[1])
                elif s.endswith("zlo zhi"):
                    df.zlo, df.zhi = float(parts[0]), float(parts[1])
                elif s.endswith("xy xz yz"):
                    df.xy, df.xz, df.yz = (
                        float(parts[0]), float(parts[1]), float(parts[2])
                    )
        i += 1

    n = df.natoms
    df.tags = np.zeros(n, dtype=np.int64)
    df.types = np.zeros(n, dtype=np.int32)
    df.x = np.zeros((n, 3))
    df.image = np.zeros((n, 3), dtype=np.int32)
    df.v = np.zeros((n, 3))
    if atom_style in ("charge", "full", "full/sph/x0image"):
        df.q = np.zeros(n)
    if atom_style in ("bond", "angle", "molecular", "full",
                      "full/sph/x0image"):
        df.molecule = np.zeros(n, dtype=np.int32)
    if atom_style in ("sph", "full/sph/x0image"):
        df.sph_rho = np.zeros(n)
        df.sph_e = np.zeros(n)
        df.sph_cv = np.zeros(n)
    if "x0image" in atom_style:
        df.x0 = np.zeros((n, 3))
    # hybrid: "id type x y z" then each sub-style's extra columns in
    # sub-style order, then images (ref: atom_vec_hybrid.cpp data_atom —
    # sub-style fields_data_atom minus the base fields, concatenated)
    substyles = atom_style.split()[1:] if atom_style.startswith("hybrid") \
        else []
    if atom_style == "sphere":
        # non-hybrid sphere: id type diameter density x y z (extras BEFORE
        # the coords, ref: AtomVecSphere fields_data_atom)
        df.radius = np.zeros(n)
        df.rmass = np.zeros(n)
        df.omega = np.zeros((n, 3))
    if "full" in substyles or "bond" in substyles or "molecular" in substyles:
        df.molecule = np.zeros(n, dtype=np.int32)
    if "full" in substyles or "charge" in substyles:
        df.q = np.zeros(n)
    if "sphere" in substyles:
        df.radius = np.zeros(n)
        df.rmass = np.zeros(n)
        df.omega = np.zeros((n, 3))
    if "dipole" in substyles:
        df.mu = np.zeros((n, 3))
    df.masses = np.ones(df.natomtypes + 1)

    def parse_atoms(rows):
        df.file_order = np.array([int(t[0]) for t in rows], dtype=np.int64)
        for toks in rows:
            tag = int(toks[0])
            k = tag - 1
            if not (0 <= k < n):
                raise ValueError(f"atom tag {tag} out of range 1..{n}")
            df.tags[k] = tag
            c = 1
            if substyles:
                df.types[k] = int(toks[c]); c += 1
                df.x[k] = [float(toks[c]), float(toks[c + 1]),
                           float(toks[c + 2])]
                c += 3
                for sub in substyles:
                    if sub in ("full", "bond", "molecular"):
                        df.molecule[k] = int(toks[c]); c += 1
                        if sub == "full":
                            df.q[k] = float(toks[c]); c += 1
                    elif sub == "charge":
                        df.q[k] = float(toks[c]); c += 1
                    elif sub == "sphere":
                        diam = float(toks[c]); dens = float(toks[c + 1])
                        c += 2
                        df.radius[k] = 0.5 * diam
                        # rmass from the sphere volume; diameter 0 means
                        # density IS the mass (atom_vec_sphere.cpp:448)
                        if diam > 0.0:
                            df.rmass[k] = (4.0 * np.pi / 3.0
                                           * df.radius[k] ** 3 * dens)
                        else:
                            df.rmass[k] = dens
                    elif sub == "dipole":
                        df.mu[k] = [float(toks[c]), float(toks[c + 1]),
                                    float(toks[c + 2])]
                        c += 3
                if len(toks) >= c + 3:
                    df.image[k] = [int(toks[c]), int(toks[c + 1]),
                                   int(toks[c + 2])]
                continue
            if atom_style == "sphere":
                df.types[k] = int(toks[c]); c += 1
                diam = float(toks[c]); dens = float(toks[c + 1]); c += 2
                df.radius[k] = 0.5 * diam
                df.rmass[k] = ((4.0 * np.pi / 3.0) * df.radius[k] ** 3 * dens
                               if diam > 0.0 else dens)
                df.x[k] = [float(toks[c]), float(toks[c + 1]),
                           float(toks[c + 2])]
                c += 3
                if len(toks) >= c + 3:
                    df.image[k] = [int(toks[c]), int(toks[c + 1]),
                                   int(toks[c + 2])]
                continue
            if "x0image" in atom_style:
                # fork styles: x0 (rest position) precedes x
                if atom_style == "full/sph/x0image":
                    df.molecule[k] = int(toks[c]); c += 1
                    df.types[k] = int(toks[c]); c += 1
                    df.q[k] = float(toks[c]); c += 1
                    df.sph_rho[k] = float(toks[c]); c += 1
                    df.sph_e[k] = float(toks[c]); c += 1
                    df.sph_cv[k] = float(toks[c]); c += 1
                else:  # x0image: id type x0 x
                    df.types[k] = int(toks[c]); c += 1
                df.x0[k] = [float(toks[c]), float(toks[c + 1]),
                            float(toks[c + 2])]
                c += 3
                df.x[k] = [float(toks[c]), float(toks[c + 1]),
                           float(toks[c + 2])]
                c += 3
                if len(toks) >= c + 3:
                    df.image[k] = [int(toks[c]), int(toks[c + 1]),
                                   int(toks[c + 2])]
                continue
            if atom_style in ("bond", "angle", "molecular", "full"):
                df.molecule[k] = int(toks[c]); c += 1
            df.types[k] = int(toks[c]); c += 1
            if atom_style in ("charge", "full"):
                df.q[k] = float(toks[c]); c += 1
            if atom_style == "sph":
                # id type rho esph cv x y z (ref: src/SPH/atom_vec_sph.cpp)
                df.sph_rho[k] = float(toks[c]); c += 1
                df.sph_e[k] = float(toks[c]); c += 1
                df.sph_cv[k] = float(toks[c]); c += 1
            df.x[k] = [float(toks[c]), float(toks[c + 1]), float(toks[c + 2])]
            c += 3
            if len(toks) >= c + 3:
                df.image[k] = [int(toks[c]), int(toks[c + 1]), int(toks[c + 2])]

    def parse_simple(rows, width):
        out = np.zeros((len(rows), width), dtype=np.int64)
        for r, toks in enumerate(rows):
            # id type atom1 atom2 ... -> drop the id
            out[r] = [int(t) for t in toks[1:width + 1]]
        return out

    # sections
    while i < len(lines):
        sec = lines[i].split("#")[0].strip()
        i += 1
        # skip blank lines after the header
        rows = []
        while i < len(lines):
            s = lines[i].split("#")[0].strip()
            if s in _SECTIONS:
                break
            if s:
                rows.append(s.split())
            i += 1
        if sec == "Masses":
            for toks in rows:
                df.masses[int(toks[0])] = float(toks[1])
        elif sec == "Atoms":
            parse_atoms(rows)
        elif sec == "Velocities":
            for toks in rows:
                k = int(toks[0]) - 1
                df.v[k] = [float(toks[1]), float(toks[2]), float(toks[3])]
                if df.omega is not None and len(toks) >= 7:
                    # sphere sub-style appends omega (atom_vec_sphere.cpp
                    # data_vel: vx vy vz wx wy wz)
                    df.omega[k] = [float(toks[4]), float(toks[5]),
                                   float(toks[6])]
        elif sec == "Bonds":
            df.bonds = parse_simple(rows, 3)
        elif sec == "Angles":
            df.angles = parse_simple(rows, 4)
        elif sec == "Dihedrals":
            df.dihedrals = parse_simple(rows, 5)
        elif sec == "Impropers":
            df.impropers = parse_simple(rows, 5)
        elif sec:
            df.coeffs[sec] = rows

    if n and np.any(df.tags == 0):
        raise ValueError("data file Atoms section missing some tags 1..N")
    return df
