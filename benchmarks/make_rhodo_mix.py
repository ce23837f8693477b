"""Generate a rhodopsin-CLASS benchmark system: CHARMM water + CH2 chains.

The reference's `bench/data.rhodo` is stripped from this mirror
(.MISSING_LARGE_BLOBS). bench/in.rhodo's style stack and load profile
(ref: bench/in.rhodo:1-28 and log.6Oct16.rhodo.fixed.icc.1 header:
32000 atoms, 27723 bonds, 40467 angles, 56829 dihedrals, 1034 impropers,
`fix shake ... m 1.0 a 232`, NPT-z) is reproduced here with a synthetic
two-phase system of the same scale and term RATIOS:

  - TIP3P water slab (~40% of atoms): bond harmonic + angle charmm,
    SHAKE-rigid via the mass-1.0 rule + the water angle type;
  - CH2 polymer slab (~60% of atoms, lipid-tail-like): C-C/C-H bonds,
    CHARMM angles with Urey-Bradley terms, X-C-C-X charmm dihedrals with
    weight 1.0 (nonzero 1-4 LJ/coul through the pair style's eps14/sig14,
    ref: src/MOLECULE/dihedral_charmm.cpp:63 1-4 coupling), harmonic
    impropers, C-H bonds SHAKE-constrained by the same m 1.0 rule.

Default scale (nwater=4250, nchain=400 x 16 carbons): 31,950 atoms,
27,300 bonds, 40,250 angles, 51,600 dihedrals, 1,200 impropers.

Usage: python benchmarks/make_rhodo_mix.py [out.data]
"""

from __future__ import annotations

import sys

import numpy as np

# CHARMM TIP3P (ref: pair lj/charmm docs + common charmm water params)
R_OH = 0.9572
THETA_HOH = 104.52
Q_O, Q_H = -0.834, 0.417
MASS_O, MASS_H, MASS_C = 15.9994, 1.008, 12.011
EPS_O, SIG_O = 0.1521, 3.1507
EPS_HW, SIG_HW = 0.0460, 0.4000
K_BOND_W, K_ANGLE_W = 450.0, 55.0

# CHARMM-like alkane (CTL2/HAL2-class values)
R_CC, K_CC = 1.530, 222.5
R_CH, K_CH = 1.111, 309.0
Q_C, Q_HC = -0.18, 0.09
EPS_C, SIG_C, EPS14_C, SIG14_C = 0.0560, 3.5814, 0.01, 3.3854
EPS_HC, SIG_HC = 0.0280, 2.3876
ANG_CCC = (58.35, 113.60, 11.16, 2.561)   # K theta0 K_ub r_ub
ANG_CCH = (26.50, 110.10, 22.53, 2.179)
ANG_HCH = (35.50, 109.00, 5.40, 1.802)
DIH_XCCX = (0.19, 3, 0, 1.0)              # K n d weight (1-4 at full lj14)
IMP_K, IMP_CHI0 = 1.10, 0.0


def water_geometry():
    th = np.deg2rad(THETA_HOH) / 2.0
    return np.stack([
        np.zeros(3),
        np.array([R_OH * np.sin(th), 0.0, R_OH * np.cos(th)]),
        np.array([-R_OH * np.sin(th), 0.0, R_OH * np.cos(th)]),
    ])


def chain_geometry(nc):
    """All-trans (CH2)_nc: zig-zag backbone along x in the xz plane, H
    pairs tetrahedral — along the NEGATIVE bisector of the two C-C bonds,
    splayed +/-y by half the H-C-H angle (107 deg). This gives standard
    alkane geometry: gauche 1-4 H..H ~2.5 A (a naive coplanar-H layout
    puts them at 1.3 A and the 1-4 LJ through the dihedral explodes)."""
    th = np.deg2rad(113.6) / 2.0
    dx = R_CC * np.sin(th)
    dz = R_CC * np.cos(th)
    beta = np.deg2rad(107.0) / 2.0
    C = np.array([[i * dx, 0.0, (i % 2) * dz] for i in range(nc)])
    xs = []
    for i in range(nc):
        d = []
        if i > 0:
            d.append(C[i - 1] - C[i])
        if i < nc - 1:
            d.append(C[i + 1] - C[i])
        u = sum(v / np.linalg.norm(v) for v in d)
        nu = np.linalg.norm(u)
        u = u / nu if nu > 1e-9 else np.array([0.0, 0.0, 1.0])
        h1 = -u * np.cos(beta) + np.array([0, 1, 0]) * np.sin(beta)
        h2 = -u * np.cos(beta) - np.array([0, 1, 0]) * np.sin(beta)
        xs.extend([C[i], C[i] + R_CH * h1, C[i] + R_CH * h2])
    return np.asarray(xs)  # [3*nc, 3], order C,H,H per carbon


def build_system(nwater=4250, nchain=400, nc=16, wspacing=3.12,
                 seed=12345):
    rng = np.random.default_rng(seed)

    # water slab: grid 20 x 20 x ceil(nwater/400) with random orientations
    gx = gy = 20
    gz = -(-nwater // (gx * gy))
    Lx = gx * wspacing
    Ly = gy * wspacing
    wz = gz * wspacing
    geom = water_geometry()
    wpos = []
    sites = [(i, j, k) for k in range(gz) for j in range(gy)
             for i in range(gx)][:nwater]
    for (i, j, k) in sites:
        m = rng.standard_normal((3, 3))
        q, r = np.linalg.qr(m)
        q *= np.sign(np.diag(r))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        center = (np.array([i, j, k]) + 0.5) * wspacing
        wpos.append(geom @ q.T + center)
    wpos = np.concatenate(wpos)

    # chain slab above the water: chains along x, 2 end-to-end per row
    cg = chain_geometry(nc)
    clen = (nc - 1) * R_CC * np.sin(np.deg2rad(113.6) / 2) + 2.0
    perx = max(1, int(Lx // (clen + 4.0)))
    ys = 4.6
    pery = int(Ly // ys)
    layers = -(-nchain // (perx * pery))
    zs = 4.8
    cz0 = wz + 2.4
    cpos = []
    placed = 0
    for lay in range(layers):
        for j in range(pery):
            for i in range(perx):
                if placed >= nchain:
                    break
                base = np.array([1.0 + i * (clen + 4.0),
                                 (j + 0.5) * ys,
                                 cz0 + (lay + 0.5) * zs])
                cpos.append(cg + base)
                placed += 1
    cpos = np.concatenate(cpos)
    Lz = cz0 + layers * zs + 2.4
    return wpos, cpos, nwater, placed, nc, np.array([Lx, Ly, Lz])


def write_data(path, nwater=4250, nchain=400, nc=16, seed=12345):
    wpos, cpos, nw, nch, nc, L = build_system(nwater, nchain, nc, seed=seed)
    natoms = 3 * nw + 3 * nc * nch

    # topology assembly -----------------------------------------------------
    bonds, angles, dihedrals, impropers = [], [], [], []
    # atom rows: (mol, type, q); waters first
    atoms = []
    for m in range(nw):
        atoms += [(m + 1, 1, Q_O), (m + 1, 2, Q_H), (m + 1, 2, Q_H)]
        o = 3 * m + 1
        bonds += [(1, o, o + 1), (1, o, o + 2)]
        angles += [(1, o + 1, o, o + 2)]
    base = 3 * nw
    for ch in range(nch):
        mol = nw + ch + 1
        a0 = base + 3 * nc * ch + 1  # 1-based id of first C
        C = [a0 + 3 * i for i in range(nc)]
        H1 = [c + 1 for c in C]
        H2 = [c + 2 for c in C]
        for i in range(nc):
            atoms += [(mol, 3, Q_C), (mol, 4, Q_HC), (mol, 4, Q_HC)]
        for i in range(nc - 1):
            bonds.append((2, C[i], C[i + 1]))
        for i in range(nc):
            bonds += [(3, C[i], H1[i]), (3, C[i], H2[i])]
        for i in range(nc - 2):
            angles.append((2, C[i], C[i + 1], C[i + 2]))
        for i in range(nc):
            angles.append((4, H1[i], C[i], H2[i]))
            for nb in ((C[i - 1],) if i > 0 else ()) + (
                    (C[i + 1],) if i < nc - 1 else ()):
                angles += [(3, nb, C[i], H1[i]), (3, nb, C[i], H2[i])]
        # X-C-C-X dihedrals around every central C-C bond
        for i in range(nc - 1):
            left = ([C[i - 1]] if i > 0 else []) + [H1[i], H2[i]]
            right = ([C[i + 2]] if i + 2 < nc else []) + [H1[i + 1],
                                                          H2[i + 1]]
            for a in left:
                for d in right:
                    dihedrals.append((1, a, C[i], C[i + 1], d))
        # 3 impropers per chain (2nd, middle, 2nd-last carbon)
        for i in (1, nc // 2, nc - 2):
            impropers.append((1, C[i], C[i - 1], H1[i], H2[i]))

    with open(path, "w") as f:
        f.write("CHARMM water + CH2-chain rhodo-class benchmark system\n\n")
        f.write(f"{natoms} atoms\n{len(bonds)} bonds\n{len(angles)} angles\n"
                f"{len(dihedrals)} dihedrals\n{len(impropers)} impropers\n\n")
        f.write("4 atom types\n3 bond types\n4 angle types\n"
                "1 dihedral types\n1 improper types\n\n")
        f.write(f"0.0 {L[0]:.6f} xlo xhi\n0.0 {L[1]:.6f} ylo yhi\n"
                f"0.0 {L[2]:.6f} zlo zhi\n\n")
        f.write(f"Masses\n\n1 {MASS_O}\n2 {MASS_H}\n3 {MASS_C}\n"
                f"4 {MASS_H}\n\n")
        f.write("Pair Coeffs\n\n")
        f.write(f"1 {EPS_O} {SIG_O} {EPS_O} {SIG_O}\n")
        f.write(f"2 {EPS_HW} {SIG_HW} {EPS_HW} {SIG_HW}\n")
        f.write(f"3 {EPS_C} {SIG_C} {EPS14_C} {SIG14_C}\n")
        f.write(f"4 {EPS_HC} {SIG_HC} {EPS_HC} {SIG_HC}\n\n")
        f.write(f"Bond Coeffs\n\n1 {K_BOND_W} {R_OH}\n"
                f"2 {K_CC} {R_CC}\n3 {K_CH} {R_CH}\n\n")
        f.write("Angle Coeffs\n\n")
        f.write(f"1 {K_ANGLE_W} {THETA_HOH} 0.0 0.0\n")
        for t, p in ((2, ANG_CCC), (3, ANG_CCH), (4, ANG_HCH)):
            f.write(f"{t} {p[0]} {p[1]} {p[2]} {p[3]}\n")
        f.write("\nDihedral Coeffs\n\n")
        f.write(f"1 {DIH_XCCX[0]} {DIH_XCCX[1]} {DIH_XCCX[2]} "
                f"{DIH_XCCX[3]}\n")
        f.write(f"\nImproper Coeffs\n\n1 {IMP_K} {IMP_CHI0}\n\n")
        f.write("Atoms\n\n")
        x = np.concatenate([wpos, cpos])
        for idx, (mol, t, q) in enumerate(atoms):
            f.write(f"{idx + 1} {mol} {t} {q} "
                    f"{x[idx, 0]:.6f} {x[idx, 1]:.6f} {x[idx, 2]:.6f}\n")
        for sec, rows in (("Bonds", bonds), ("Angles", angles),
                          ("Dihedrals", dihedrals),
                          ("Impropers", impropers)):
            f.write(f"\n{sec}\n\n")
            for n, r in enumerate(rows):
                f.write(f"{n + 1} " + " ".join(str(v) for v in r) + "\n")
    return natoms, len(bonds), len(angles), len(dihedrals), len(impropers), L


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "data.rhodo-mix"
    n, nb, na, nd, ni, L = write_data(out)
    print(f"wrote {out}: {n} atoms, {nb} bonds, {na} angles, {nd} dihedrals,"
          f" {ni} impropers, box {L[0]:.1f}x{L[1]:.1f}x{L[2]:.1f} A")
