"""Trajectory/dump writers + data-file writer.

TPU-native equivalents of the reference's dump styles
(ref: src/dump_atom.cpp, src/dump_custom.cpp, src/dump_xyz.cpp) and
`write_data` (ref: src/write_data.cpp). Host-side output: arrays come off
the device once per frame.
"""

from __future__ import annotations

import jax
import numpy as np


def _get(sim):
    from ..core.state import atom_order

    st = sim.state
    n = int(jax.device_get(st.nlocal))
    rows = atom_order(st)  # layout-agnostic (sorted mode scatters rows)
    x = np.asarray(jax.device_get(st.x))[rows]
    v = np.asarray(jax.device_get(st.v))[rows]
    t = np.asarray(jax.device_get(st.type))[rows]
    tag = np.asarray(jax.device_get(st.tag))[rows]
    img = np.asarray(jax.device_get(st.image))[rows]
    lo = np.asarray(jax.device_get(st.box.lo))
    hi = np.asarray(jax.device_get(st.box.hi))
    return st, n, x, v, t, tag, img, lo, hi


def write_cfg_frame(path: str, sim, args=(), append: bool = False):
    """AtomEye extended CFG snapshot (ref: src/dump_cfg.cpp). The
    reference requires the columns to begin `mass type xs ys zs`; extra
    columns become auxiliary properties."""
    st, n, x, v, t, tag, img, lo, hi = _get(sim)
    masses = np.asarray(jax.device_get(sim.state.mass))
    prd = hi - lo
    cols = list(args) or ["mass", "type", "xs", "ys", "zs"]
    if cols[:5] != ["mass", "type", "xs", "ys", "zs"]:
        raise ValueError("dump cfg requires columns mass type xs ys zs")
    aux = cols[5:]
    s = (x - lo) / prd
    colmap = {
        "id": tag, "vx": v[:, 0], "vy": v[:, 1], "vz": v[:, 2],
        "x": x[:, 0], "y": x[:, 1], "z": x[:, 2],
    }
    if sim.state.q is not None:
        from ..core.state import atom_order

        colmap["q"] = np.asarray(jax.device_get(sim.state.q))[
            atom_order(sim.state)]
    mode = "a" if append else "w"
    with open(path, mode) as f:
        f.write(f"Number of particles = {n}\n")
        f.write("A = 1.0 Angstrom (basic length-scale)\n")
        # orthogonal H0 matrix (ref: dump_cfg.cpp write_header)
        for a in range(3):
            for b in range(3):
                val = prd[a] if a == b else 0.0
                f.write(f"H0({a+1},{b+1}) = {val:.8g} A\n")
        f.write(".NO_VELOCITY.\n")
        f.write(f"entry_count = {3 + len(aux)}\n")
        for k, c in enumerate(aux):
            f.write(f"auxiliary[{k}] = {c}\n")
        data = [colmap[c] for c in aux]
        for i in range(n):
            f.write(f"{masses[t[i]]:.8g}\n{int(t[i])}\n")
            row = [f"{s[i, d]:.8g}" for d in range(3)]
            row += [str(d[i]) for d in data]
            f.write(" ".join(row) + "\n")


def write_local_frame(path: str, sim, script, args=(),
                      append: bool = False):
    """dump local: rows from local computes, c_ID[col] references
    (ref: src/dump_local.cpp; typical use with compute pair/local or
    bond/local)."""
    st, n, x, v, t, tag, img, lo, hi = _get(sim)
    step = int(jax.device_get(sim.state.ntimestep))
    cols = []
    labels = []
    for w in args:
        if w.startswith("c_"):
            ref = w[2:]
            ci = None
            if "[" in ref:
                ref, rest = ref.split("[")
                ci = int(rest.rstrip("]")) - 1
            arr = np.asarray(script.get_compute(ref))
            if arr.ndim == 2 and ci is not None:
                arr = arr[:, ci]
            cols.append(np.atleast_1d(arr))
            labels.append(w)
        elif w == "index":
            cols.append(None)
            labels.append(w)
        else:
            raise ValueError(f"dump local column {w}")
    nrows = max((len(c) for c in cols if c is not None), default=0)
    mode = "a" if append else "w"
    with open(path, mode) as f:
        f.write("ITEM: TIMESTEP\n%d\n" % step)
        f.write("ITEM: NUMBER OF ENTRIES\n%d\n" % nrows)
        f.write("ITEM: BOX BOUNDS pp pp pp\n")
        for d in range(3):
            f.write(f"{lo[d]:.16e} {hi[d]:.16e}\n")
        f.write("ITEM: ENTRIES " + " ".join(labels) + "\n")
        for i in range(nrows):
            row = [str(i + 1) if c is None else f"{c[i]:.8g}"
                   for c in cols]
            f.write(" ".join(row) + "\n")


def write_dump_frame(path: str, sim, style: str = "atom", args=(),
                     append: bool = False, sort: bool = False):
    """One snapshot in the reference's dump format
    (ref: dump_atom.cpp format: ITEM: TIMESTEP/NUMBER/BOX/ATOMS).
    sort=True orders rows by atom ID (ref: dump_modify sort id);
    a .gz suffix writes gzip-compressed text (ref: dump styles */gz)."""
    st, n, x, v, t, tag, img, lo, hi = _get(sim)
    if sort:
        order = np.argsort(tag[:n])
        x, v, t, tag, img = (x[order], v[order], t[order], tag[order],
                             img[order])
    step = int(jax.device_get(st.ntimestep))
    mode = "a" if append else "w"
    if path.endswith(".gz"):
        import gzip

        opener = lambda: gzip.open(path, mode + "t")
    else:
        opener = lambda: open(path, mode)
    with opener() as f:
        if style == "xyz":
            f.write(f"{n}\n Atoms. Timestep: {step}\n")
            for i in range(n):
                f.write(f"{t[i]} {x[i,0]:.8g} {x[i,1]:.8g} {x[i,2]:.8g}\n")
            return
        f.write("ITEM: TIMESTEP\n%d\n" % step)
        f.write("ITEM: NUMBER OF ATOMS\n%d\n" % n)
        f.write("ITEM: BOX BOUNDS pp pp pp\n")
        for d in range(3):
            f.write(f"{lo[d]:.16e} {hi[d]:.16e}\n")
        prd = hi - lo
        if style == "atom":
            # scaled coords + image flags (ref: dump_atom default)
            f.write("ITEM: ATOMS id type xs ys zs\n")
            s = (x - lo) / prd
            for i in range(n):
                f.write(f"{tag[i]} {t[i]} {s[i,0]:.8g} {s[i,1]:.8g} "
                        f"{s[i,2]:.8g}\n")
        elif style == "custom":
            cols = list(args) or ["id", "type", "x", "y", "z"]
            f.write("ITEM: ATOMS " + " ".join(cols) + "\n")
            colmap = {
                "id": tag, "type": t,
                "x": x[:, 0], "y": x[:, 1], "z": x[:, 2],
                "vx": v[:, 0], "vy": v[:, 1], "vz": v[:, 2],
                "ix": img[:, 0], "iy": img[:, 1], "iz": img[:, 2],
            }
            data = [colmap[c] for c in cols if c in colmap]
            for i in range(n):
                f.write(" ".join(str(d[i]) for d in data) + "\n")
        else:
            raise ValueError(f"dump style {style} unsupported")


def write_data(path: str, sim, title: str = "generated by lammps_kokkos_port_tpu"):
    """LAMMPS data file writer (subset; ref: src/write_data.cpp)."""
    st, n, x, v, t, tag, img, lo, hi = _get(sim)
    masses = np.asarray(jax.device_get(st.mass))
    ntypes = len(masses) - 1
    from ..core.state import atom_order

    rows = atom_order(st)
    q = (np.asarray(jax.device_get(st.q))[rows]
         if st.q is not None else None)
    mol = (np.asarray(jax.device_get(st.molecule))[rows]
           if st.molecule is not None else None)
    with open(path, "w") as f:
        f.write(f"{title}\n\n")
        f.write(f"{n} atoms\n{ntypes} atom types\n\n")
        f.write(f"{lo[0]:.16g} {hi[0]:.16g} xlo xhi\n")
        f.write(f"{lo[1]:.16g} {hi[1]:.16g} ylo yhi\n")
        f.write(f"{lo[2]:.16g} {hi[2]:.16g} zlo zhi\n\n")
        f.write("Masses\n\n")
        for i in range(1, ntypes + 1):
            f.write(f"{i} {masses[i]:.16g}\n")
        f.write("\nAtoms\n\n")
        for i in range(n):
            cols = [str(tag[i])]
            if mol is not None:
                cols.append(str(mol[i]))
            cols.append(str(t[i]))
            if q is not None:
                cols.append(f"{q[i]:.16g}")
            cols += [f"{x[i,d]:.16g}" for d in range(3)]
            cols += [str(img[i, d]) for d in range(3)]
            f.write(" ".join(cols) + "\n")
        f.write("\nVelocities\n\n")
        for i in range(n):
            f.write(f"{tag[i]} {v[i,0]:.16g} {v[i,1]:.16g} {v[i,2]:.16g}\n")
