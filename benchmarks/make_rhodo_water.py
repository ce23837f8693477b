"""Generate a rhodopsin-class benchmark system: a CHARMM-style water box.

The reference's `bench/data.rhodo` is stripped from this mirror
(.MISSING_LARGE_BLOBS), so this synthesizes a system of the same CLASS and
scale: atom_style full, bond harmonic, angle charmm, pair
lj/charmm/coul/long + PPPM, `fix shake b 1 a 1` rigid waters, NPT — the
exact style stack of bench/in.rhodo (32k atoms there; 10,800 TIP3P waters
= 32,400 atoms here).

Usage: python benchmarks/make_rhodo_water.py [nside] [out.data]
       (nside^3 molecules; default 22 -> 31,944 atoms)
"""

from __future__ import annotations

import sys

import numpy as np

# CHARMM TIP3P (ref: doc pair lj/charmm + common charmm water params)
R_OH = 0.9572
THETA_HOH = 104.52  # degrees
Q_O = -0.834
Q_H = 0.417
MASS_O = 15.9994
MASS_H = 1.008
EPS_O, SIG_O = 0.1521, 3.1507
EPS_H, SIG_H = 0.0460, 0.4000
K_BOND, K_ANGLE = 450.0, 55.0


def water_geometry():
    th = np.deg2rad(THETA_HOH) / 2.0
    o = np.zeros(3)
    h1 = np.array([R_OH * np.sin(th), 0.0, R_OH * np.cos(th)])
    h2 = np.array([-R_OH * np.sin(th), 0.0, R_OH * np.cos(th)])
    return np.stack([o, h1, h2])


def build_water_box(nside, spacing: float = 3.1, seed: int = 12345):
    """Molecules on an (nx, ny, nz) grid (int = cubic) with seeded random
    orientations."""
    rng = np.random.default_rng(seed)
    geom = water_geometry()
    nx, ny, nz = (nside,) * 3 if isinstance(nside, int) else nside
    nmol = nx * ny * nz
    L = np.array([nx, ny, nz]) * spacing
    xs = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                # random rotation (QR of a seeded gaussian -> uniform-ish)
                m = rng.standard_normal((3, 3))
                q, r = np.linalg.qr(m)
                q *= np.sign(np.diag(r))
                if np.linalg.det(q) < 0:
                    q[:, 0] = -q[:, 0]
                center = (np.array([i, j, k]) + 0.5) * spacing
                xs.append(geom @ q.T + center)
    x = np.concatenate(xs)
    return x, nmol, L


def write_data(path: str, nside=22, spacing: float = 3.1,
               seed: int = 12345):
    x, nmol, L = build_water_box(nside, spacing, seed)
    natoms = 3 * nmol
    with open(path, "w") as f:
        f.write("CHARMM TIP3P water box (rhodo-class benchmark system)\n\n")
        f.write(f"{natoms} atoms\n{2 * nmol} bonds\n{nmol} angles\n\n")
        f.write("2 atom types\n1 bond types\n1 angle types\n\n")
        f.write(f"0.0 {L[0]:.6f} xlo xhi\n0.0 {L[1]:.6f} ylo yhi\n"
                f"0.0 {L[2]:.6f} zlo zhi\n\n")
        f.write(f"Masses\n\n1 {MASS_O}\n2 {MASS_H}\n\n")
        f.write("Pair Coeffs\n\n")
        f.write(f"1 {EPS_O} {SIG_O} {EPS_O} {SIG_O}\n")
        f.write(f"2 {EPS_H} {SIG_H} {EPS_H} {SIG_H}\n\n")
        f.write(f"Bond Coeffs\n\n1 {K_BOND} {R_OH}\n\n")
        f.write(f"Angle Coeffs\n\n1 {K_ANGLE} {THETA_HOH} 0.0 0.0\n\n")
        f.write("Atoms\n\n")
        for m in range(nmol):
            for a, (t, q) in enumerate(((1, Q_O), (2, Q_H), (2, Q_H))):
                idx = 3 * m + a
                f.write(f"{idx + 1} {m + 1} {t} {q} "
                        f"{x[idx, 0]:.6f} {x[idx, 1]:.6f} {x[idx, 2]:.6f}\n")
        f.write("\nBonds\n\n")
        for m in range(nmol):
            o = 3 * m + 1
            f.write(f"{2 * m + 1} 1 {o} {o + 1}\n")
            f.write(f"{2 * m + 2} 1 {o} {o + 2}\n")
        f.write("\nAngles\n\n")
        for m in range(nmol):
            o = 3 * m + 1
            f.write(f"{m + 1} 1 {o + 1} {o} {o + 2}\n")
    return natoms, L


if __name__ == "__main__":
    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    out = sys.argv[2] if len(sys.argv) > 2 else "data.rhodo-water"
    n, L = write_data(out, nside=nside)
    print(f"wrote {out}: {n} atoms, box {L[0]:.2f}x{L[1]:.2f}x{L[2]:.2f} A")
