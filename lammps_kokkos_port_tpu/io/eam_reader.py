"""EAM potential file readers: funcfl (`pair_style eam`), setfl
(`eam/alloy`), and Finnis-Sinclair setfl (`eam/fs`).

Formats follow the reference (ref: src/MANYBODY/pair_eam.cpp read_file,
pair_eam_alloy.cpp read_file, pair_eam_fs.cpp; bench/Cu_u3.eam):

funcfl:  comment / (Z, mass, a0, lattice) / (nrho drho nr dr cut)
         then nrho F(rho) values, nr Z(r) values, nr rho(r) values.
setfl:   3 comment lines / nelements + names / (nrho drho nr dr cut)
         then per element: (Z mass a0 lattice), nrho F, nelem*nr rho;
         then nelem*(nelem+1)/2 r*phi(r) tables (i>=j order).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Funcfl:
    mass: float
    nrho: int
    drho: float
    nr: int
    dr: float
    cut: float
    frho: np.ndarray  # [nrho] F(rho)
    zr: np.ndarray  # [nr] Z(r) (funcfl) — z2r built as 27.2*0.529*zi*zj
    rhor: np.ndarray  # [nr] rho(r)


@dataclasses.dataclass
class Setfl:
    elements: list[str]
    mass: np.ndarray  # [nelem]
    nrho: int
    drho: float
    nr: int
    dr: float
    cut: float
    frho: np.ndarray  # [nelem, nrho]
    rhor: np.ndarray  # [nelem, nr] (fs: [nelem, nelem, nr])
    z2r: np.ndarray  # [nelem, nelem, nr] r*phi tables (symmetric fill)
    fs: bool = False


def _read_numbers(path: str) -> tuple[list[str], list[float]]:
    with open(path) as f:
        lines = f.read().splitlines()
    return lines


def read_funcfl(path: str) -> Funcfl:
    lines = _read_numbers(path)
    # line 0: comment; line 1: Z mass a0 lattice; line 2: nrho drho nr dr cut
    hdr = lines[1].split()
    mass = float(hdr[1])
    p = lines[2].split()
    nrho, drho, nr, dr, cut = int(p[0]), float(p[1]), int(p[2]), float(p[3]), float(p[4])
    vals = []
    for ln in lines[3:]:
        vals.extend(float(t) for t in ln.split())
    vals = np.asarray(vals, dtype=np.float64)
    need = nrho + 2 * nr
    if len(vals) < need:
        raise ValueError(f"funcfl file {path}: expected {need} values, got {len(vals)}")
    frho = vals[:nrho]
    zr = vals[nrho:nrho + nr]
    rhor = vals[nrho + nr:nrho + 2 * nr]
    return Funcfl(mass=mass, nrho=nrho, drho=drho, nr=nr, dr=dr, cut=cut,
                  frho=frho, zr=zr, rhor=rhor)


def read_setfl(path: str, fs: bool = False) -> Setfl:
    lines = _read_numbers(path)
    elems_line = lines[3].split()
    nelem = int(elems_line[0])
    elements = elems_line[1:1 + nelem]
    p = lines[4].split()
    nrho, drho, nr, dr, cut = int(p[0]), float(p[1]), int(p[2]), float(p[3]), float(p[4])

    vals = []
    elem_masses = []
    # stream the rest token-wise: per element: 4 header values then tables
    tokens = []
    for ln in lines[5:]:
        tokens.extend(ln.split())
    pos = 0

    def take(n):
        nonlocal pos
        out = np.asarray([float(t) for t in tokens[pos:pos + n]], dtype=np.float64)
        if len(out) != n:
            raise ValueError(f"setfl file {path}: ran out of values")
        pos += n
        return out

    frho = np.zeros((nelem, nrho))
    if fs:
        rhor = np.zeros((nelem, nelem, nr))
    else:
        rhor = np.zeros((nelem, nr))
    for i in range(nelem):
        # element header: Z mass a0 lattice — lattice is a STRING (e.g.
        # "FCC"), so parse only the mass (ref: pair_eam_alloy.cpp read_file)
        hdr_toks = tokens[pos:pos + 4]
        pos += 4
        elem_masses.append(float(hdr_toks[1]))
        frho[i] = take(nrho)
        if fs:
            # fs: rho_{alpha beta}(r) for this alpha, all beta
            for jb in range(nelem):
                rhor[i, jb] = take(nr)
        else:
            rhor[i] = take(nr)

    z2r = np.zeros((nelem, nelem, nr))
    for i in range(nelem):
        for j in range(i + 1):
            t = take(nr)
            z2r[i, j] = t
            z2r[j, i] = t

    return Setfl(
        elements=elements, mass=np.asarray(elem_masses), nrho=nrho, drho=drho,
        nr=nr, dr=dr, cut=cut, frho=frho, rhor=rhor, z2r=z2r, fs=fs,
    )
