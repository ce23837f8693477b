"""Native (C++) runtime components, loaded via ctypes.

The compute path is XLA/Pallas; the IO/parsing runtime around it is C++
where the reference's is (ref: src/read_data.cpp / src/tokenizer.cpp are
C++ for the same reason). The shared library is compiled on first use with
g++ and cached next to the package; every native entry point has a pure
Python fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "fastdata.cpp")
_CACHE = os.path.join(os.path.dirname(__file__), "..", "_native")


def _build() -> str | None:
    os.makedirs(_CACHE, exist_ok=True)
    so = os.path.join(_CACHE, "libfastdata.so")
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(src)):
        return so
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", src, "-o", so],
            check=True, capture_output=True, timeout=120,
        )
        return so
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.fastdata_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.fastdata_parse.restype = ctypes.c_int
        lib.fastdata_count.argtypes = [ctypes.c_char_p]
        lib.fastdata_count.restype = ctypes.c_int64
        lib.fastdata_box.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.float64)]
        lib.fastdata_fill.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.float64),
            np.ctypeslib.ndpointer(dtype=np.float64),
            np.ctypeslib.ndpointer(dtype=np.float64),
            np.ctypeslib.ndpointer(dtype=np.int32),
            np.ctypeslib.ndpointer(dtype=np.int32),
            np.ctypeslib.ndpointer(dtype=np.int32),
            np.ctypeslib.ndpointer(dtype=np.float64),
            np.ctypeslib.ndpointer(dtype=np.int64),
            np.ctypeslib.ndpointer(dtype=np.int64),
            np.ctypeslib.ndpointer(dtype=np.int64),
            np.ctypeslib.ndpointer(dtype=np.int64),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


_STYLE_CODE = {"atomic": 0, "charge": 1, "bond": 2, "angle": 2,
               "molecular": 2, "full": 3}


def read_data_native(path: str, atom_style: str = "full"):
    """Native read_data; returns a DataFile or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    code = _STYLE_CODE.get(atom_style)
    if code is None:
        return None
    rc = lib.fastdata_parse(path.encode(), code)
    if rc != 0:
        return None
    from .data_reader import DataFile

    c = lambda w: int(lib.fastdata_count(w.encode()))
    df = DataFile(
        natoms=c("atoms"), nbonds=c("bonds"), nangles=c("angles"),
        ndihedrals=c("dihedrals"), nimpropers=c("impropers"),
        natomtypes=c("atomtypes"), nbondtypes=c("bondtypes"),
        nangletypes=c("angletypes"), ndihedraltypes=c("dihedraltypes"),
        nimpropertypes=c("impropertypes"),
    )
    box = np.zeros(9)
    lib.fastdata_box(box)
    (df.xlo, df.xhi, df.ylo, df.yhi, df.zlo, df.zhi,
     df.xy, df.xz, df.yz) = box

    n = df.natoms
    x = np.zeros((n, 3))
    v = np.zeros((n, 3))
    q = np.zeros(n)
    typ = np.zeros(n, dtype=np.int32)
    mol = np.zeros(n, dtype=np.int32)
    img = np.zeros((n, 3), dtype=np.int32)
    masses = np.ones(df.natomtypes + 1)
    bonds = np.zeros((max(df.nbonds, 1), 3), dtype=np.int64)
    angles = np.zeros((max(df.nangles, 1), 4), dtype=np.int64)
    dihedrals = np.zeros((max(df.ndihedrals, 1), 5), dtype=np.int64)
    impropers = np.zeros((max(df.nimpropers, 1), 5), dtype=np.int64)
    lib.fastdata_fill(x, v, q, typ, mol, img, masses,
                      bonds, angles, dihedrals, impropers)
    lib.fastdata_free()

    df.x = x
    df.v = v
    df.types = typ
    df.tags = np.arange(1, n + 1, dtype=np.int64)
    df.image = img
    df.masses = masses
    if atom_style in ("charge", "full"):
        df.q = q
    if atom_style in ("bond", "angle", "molecular", "full"):
        df.molecule = mol
    df.bonds = bonds if df.nbonds else None
    df.angles = angles if df.nangles else None
    df.dihedrals = dihedrals if df.ndihedrals else None
    df.impropers = impropers if df.nimpropers else None
    return df
