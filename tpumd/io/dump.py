"""Dump writers: trajectory snapshots in LAMMPS text formats.

Reimplements the dump atom/custom/xyz styles (src/dump_atom.cpp,
dump_custom.cpp) with per-field column selection, sorted output and
wildcard filenames.  Writers are host-side (invoked at output steps after
the device sync that thermo already pays).
"""

from __future__ import annotations

import jax
import numpy as np


class Dump:
    def __init__(self, dump_id, group, style, every, path, fields=None):
        self.id = dump_id
        self.style = style
        self.every = int(every)
        self.path = path
        self.sort = False
        self.fields = fields or ["id", "type", "x", "y", "z"]
        if style == "atom":
            self.fields = ["id", "type", "xs", "ys", "zs"]
        elif style == "xyz":
            self.fields = ["type", "x", "y", "z"]
        self._opened = False

    float_fmt = "%.8g"

    def modify(self, args):
        """dump_modify keywords (src/dump.cpp modify_params)."""
        if isinstance(args, dict):  # legacy call form
            args = [t for kv in args.items() for t in kv]
        i = 0
        while i < len(args):
            key = args[i]
            if key == "sort":
                self.sort = args[i + 1] == "id"
                i += 2
            elif key == "format":
                # 'format float %fmt' / 'format int %fmt' / 'format line ...'
                if args[i + 1] == "float":
                    self.float_fmt = args[i + 2]
                i += 3
            elif key in ("first", "pad", "append", "flush", "units", "time"):
                i += 2
            elif key == "every":
                self.every = int(args[i + 1])
                i += 2
            else:
                raise ValueError(f"dump_modify keyword {key!r} not supported")

    def _columns(self, sim):
        s = sim.state
        x = np.asarray(jax.device_get(s.x), dtype=np.float64)
        v = np.asarray(jax.device_get(s.v), dtype=np.float64)
        f = np.asarray(jax.device_get(s.f), dtype=np.float64)
        tag = np.asarray(jax.device_get(s.tag))
        typ = np.asarray(jax.device_get(s.type))
        image = np.asarray(jax.device_get(s.image))
        lo = np.asarray(jax.device_get(s.box.lo), dtype=np.float64)
        hi = np.asarray(jax.device_get(s.box.hi), dtype=np.float64)
        valid = tag > 0
        order = np.nonzero(valid)[0]
        if self.sort:
            order = order[np.argsort(tag[order])]
        ell = hi - lo
        cols = {}
        for name in self.fields:
            if name == "id":
                cols[name] = tag[order]
            elif name == "type":
                cols[name] = typ[order]
            elif name in ("x", "y", "z"):
                cols[name] = x[order, "xyz".index(name)]
            elif name in ("xs", "ys", "zs"):
                d = "xyz".index(name[0])
                cols[name] = (x[order, d] - lo[d]) / ell[d]
            elif name in ("xu", "yu", "zu"):
                d = "xyz".index(name[0])
                cols[name] = x[order, d] + image[order, d] * ell[d]
            elif name in ("vx", "vy", "vz"):
                cols[name] = v[order, "xyz".index(name[1])]
            elif name in ("fx", "fy", "fz"):
                cols[name] = f[order, "xyz".index(name[1])]
            elif name in ("ix", "iy", "iz"):
                cols[name] = image[order, "xyz".index(name[1])]
            elif name == "q" and s.q is not None:
                cols[name] = np.asarray(jax.device_get(s.q))[order]
            elif name == "mol" and s.molecule is not None:
                cols[name] = np.asarray(jax.device_get(s.molecule))[order]
            elif (name in ("omegax", "omegay", "omegaz")
                  and s.omega is not None):
                cols[name] = np.asarray(jax.device_get(
                    s.omega), np.float64)[order, "xyz".index(name[-1])]
            elif name == "radius" and s.radius is not None:
                cols[name] = np.asarray(jax.device_get(s.radius),
                                        np.float64)[order]
            elif name.startswith(("c_", "f_")):
                # per-atom compute/fix reference; both return tag order
                base = name[2:]
                col = None
                if "[" in base:
                    base, rest = base.split("[", 1)
                    col = int(rest.rstrip("]")) - 1
                if name.startswith("c_"):
                    out = np.asarray(sim.computes[base].evaluate(sim))
                else:
                    fxs = [fx for fx in sim.fixes
                           if getattr(fx, "id", None) == base]
                    if not fxs:
                        raise ValueError(f"unknown fix id {base!r}")
                    out = np.asarray(fxs[0].output(sim))
                if col is not None:
                    out = out[:, col]
                cols[name] = out[tag[order] - 1]
            elif name.startswith(("i_", "d_")):
                # fix property/atom custom columns (tag-keyed store)
                out = sim.custom_peratom[name]
                cols[name] = out[tag[order] - 1]
            else:
                raise ValueError(f"dump field {name!r} not supported")
        return cols, lo, hi, len(order)

    def _write_binary(self, sim, cols, lo, hi, n, path, mode):
        """Native binary dump (DumpAtom::header_binary + write_binary,
        src/dump_atom.cpp:181-276,573-578): readable by the reference's
        tools/binary2txt and dump readers.  Triggered by a .bin suffix,
        like the reference."""
        import struct
        magic = (b"DUMPCUSTOM" if self.style == "custom" else b"DUMPATOM")
        bmap = {"p": 0, "f": 1, "s": 2, "m": 3}
        bounds = []
        for tok in sim.boundary:
            c0 = tok[0]
            c1 = tok[1] if len(tok) > 1 else tok[0]
            bounds += [bmap[c0], bmap[c1]]
        tilt = np.asarray(jax.device_get(sim.state.box.tilt), np.float64)
        tri = 1 if sim.state.box.istriclinic else 0
        mat = np.column_stack([np.asarray(cols[f], np.float64)
                               for f in self.fields])
        with open(path, mode + "b") as fh:
            fh.write(struct.pack("<q", -len(magic)))
            fh.write(magic)
            fh.write(struct.pack("<ii", 1, 2))       # ENDIAN, REVISION
            fh.write(struct.pack("<qq", sim.step, n))
            fh.write(struct.pack("<i", tri))
            fh.write(struct.pack("<6i", *bounds))
            fh.write(struct.pack("<6d", lo[0], hi[0], lo[1], hi[1],
                                 lo[2], hi[2]))
            if tri:
                fh.write(struct.pack("<3d", *tilt))
            fh.write(struct.pack("<i", len(self.fields)))  # size_one
            fh.write(struct.pack("<i", 0))            # unit_style off
            fh.write(struct.pack("<b", 0))            # time flag off
            colstr = " ".join(self.fields).encode()
            fh.write(struct.pack("<i", len(colstr)))
            fh.write(colstr)
            fh.write(struct.pack("<i", 1))            # nprocs / 1 chunk
            fh.write(struct.pack("<i", mat.size))
            fh.write(mat.astype("<f8").tobytes())

    def write(self, sim):
        cols, lo, hi, n = self._columns(sim)
        path = self.path.replace("*", str(sim.step))
        # the reference truncates a single-file dump on open; wildcard
        # files are one snapshot each and always truncated
        mode = "w" if ("*" in self.path or not self._opened) else "a"
        self._opened = True
        if path.endswith(".bin"):
            return self._write_binary(sim, cols, lo, hi, n, path, mode)
        # .gz paths write through gzip (COMPRESS package dump styles)
        if path.endswith(".gz"):
            import gzip
            opener = lambda p, m: gzip.open(p, m + "t")  # noqa: E731
        else:
            opener = open
        with opener(path, mode) as fh:
            if self.style == "xyz":
                fh.write(f"{n}\nAtoms. Timestep: {sim.step}\n")
                for i in range(n):
                    fh.write(f"{cols['type'][i]} {cols['x'][i]:.8g} "
                             f"{cols['y'][i]:.8g} {cols['z'][i]:.8g}\n")
                return
            fh.write("ITEM: TIMESTEP\n%d\n" % sim.step)
            fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % n)
            fh.write("ITEM: BOX BOUNDS pp pp pp\n")
            for d in range(3):
                fh.write(f"{lo[d]:.16e} {hi[d]:.16e}\n")
            fh.write("ITEM: ATOMS " + " ".join(self.fields) + "\n")
            mat = np.column_stack([cols[f] for f in self.fields])
            int_fields = {"id", "type", "mol", "ix", "iy", "iz"}
            fmt = " ".join("%d" if f in int_fields else self.float_fmt
                           for f in self.fields)
            np.savetxt(fh, mat, fmt=fmt)


class DumpLocal(Dump):
    """dump local: rows of local (per-bond/per-pair) compute/fix data
    (src/dump_local.cpp).  Fields are index / c_ID[n] / f_ID[n]."""

    def __init__(self, dump_id, group, style, every, path, fields=None):
        super().__init__(dump_id, group, style, every, path, fields)
        self.fields = fields or ["index"]

    def write(self, sim):
        cols = []
        nrows = None
        for name in self.fields:
            if name == "index":
                cols.append(None)   # filled once nrows is known
                continue
            if not name.startswith(("c_", "f_")):
                raise ValueError(f"dump local field {name!r} must be a "
                                 "compute/fix reference")
            base = name[2:]
            colidx = None
            if "[" in base:
                base, rest = base.split("[", 1)
                colidx = int(rest.rstrip("]")) - 1
            if name.startswith("c_"):
                out = np.asarray(sim.computes[base].evaluate(sim))
            else:
                fxs = [fx for fx in sim.fixes
                       if getattr(fx, "id", None) == base]
                out = np.asarray(fxs[0].output(sim))
            if out.ndim == 1:
                out = out[:, None]
            col = out[:, colidx if colidx is not None else 0]
            if nrows is None:
                nrows = len(col)
            elif len(col) != nrows:
                raise ValueError("dump local columns disagree on length")
            cols.append(col)
        nrows = nrows or 0
        cols = [np.arange(1, nrows + 1) if c is None else c for c in cols]
        lo = np.asarray(jax.device_get(sim.state.box.lo), np.float64)
        hi = np.asarray(jax.device_get(sim.state.box.hi), np.float64)
        path = self.path.replace("*", str(sim.step))
        mode = "w" if ("*" in self.path or not self._opened) else "a"
        self._opened = True
        with open(path, mode) as fh:
            fh.write("ITEM: TIMESTEP\n%d\n" % sim.step)
            fh.write("ITEM: NUMBER OF ENTRIES\n%d\n" % nrows)
            fh.write("ITEM: BOX BOUNDS pp pp pp\n")
            for d in range(3):
                fh.write(f"{lo[d]:.16e} {hi[d]:.16e}\n")
            fh.write("ITEM: ENTRIES " + " ".join(self.fields) + "\n")
            if nrows:
                np.savetxt(fh, np.column_stack(cols), fmt=self.float_fmt)


class DumpCFG(Dump):
    """dump cfg: AtomEye extended CFG snapshots (src/dump_cfg.cpp).
    Fields MUST start with 'mass type xs ys zs' like the reference."""

    def __init__(self, dump_id, group, style, every, path, fields=None):
        required = ["mass", "type", "xs", "ys", "zs"]
        if fields is None or fields[:5] != required:
            raise ValueError("dump cfg arguments must start with "
                             "'mass type xs ys zs'")
        super().__init__(dump_id, group, "custom", every, path,
                         fields=required[1:] + fields[5:])
        self.style = "cfg"
        self.elements = None

    def modify(self, args):
        if isinstance(args, (list, tuple)) and args and \
                args[0] == "element":
            self.elements = list(args[1:])
            return
        super().modify(args)

    def write(self, sim):
        cols, lo, hi, n = self._columns(sim)
        typ = cols["type"].astype(int)
        mass = sim.mass[typ]
        path = self.path.replace("*", str(sim.step))
        aux = [f for f in self.fields if f not in
               ("type", "xs", "ys", "zs")]
        ell = hi - lo
        tilt = np.asarray(jax.device_get(sim.state.box.tilt), np.float64)
        with open(path, "w") as fh:
            # header layout per DumpCFG::write_header
            # (src/dump_cfg.cpp:114-147): tilt in the lower triangle,
            # default element name "C" (dump_cfg.cpp:130)
            fh.write(f"Number of particles = {n}\n")
            fh.write("A = 1 Angstrom (basic length-scale)\n")
            fh.write(f"H0(1,1) = {ell[0]:g} A\n")
            fh.write("H0(1,2) = 0 A\nH0(1,3) = 0 A\n")
            fh.write(f"H0(2,1) = {tilt[0]:g} A\n")
            fh.write(f"H0(2,2) = {ell[1]:g} A\n")
            fh.write("H0(2,3) = 0 A\n")
            fh.write(f"H0(3,1) = {tilt[1]:g} A\n")
            fh.write(f"H0(3,2) = {tilt[2]:g} A\n")
            fh.write(f"H0(3,3) = {ell[2]:g} A\n")
            fh.write(".NO_VELOCITY.\n")
            fh.write(f"entry_count = {3 + len(aux)}\n")
            for k, name in enumerate(aux):
                fh.write(f"auxiliary[{k}] = {name}\n")
            # mass + element lines per atom (DumpCFG::write_lines,
            # src/dump_cfg.cpp:243-267)
            for i in range(n):
                t = typ[i]
                fh.write(f"{mass[i]:f} \n")
                el = self.elements[t - 1] if self.elements else "C"
                fh.write(f"{el} \n")
                row = [cols["xs"][i], cols["ys"][i], cols["zs"][i]] + \
                    [cols[a][i] for a in aux]
                fh.write(" ".join(f"{v:.8g}" for v in row) + "\n")


class DumpGrid(Dump):
    """dump grid: per-grid-cell data from fix ave/grid (src/dump_grid.cpp).
    Fields are f_ID:gname:dname[col] references; rows are emitted in
    iz-outer / ix-inner order like the reference's pack loops."""

    def __init__(self, dump_id, group, style, every, path, fields=None):
        super().__init__(dump_id, group, style, every, path, fields)
        self.fields = fields or []

    def write(self, sim):
        cols = []
        shape = None
        for name in self.fields:
            if not name.startswith(("f_", "c_")) or ":" not in name:
                raise ValueError(f"dump grid field {name!r} must be a "
                                 "f_ID:grid:data reference")
            base, gname, dname = name[2:].split(":", 2)
            col = None
            if "[" in dname:
                dname, rest = dname.split("[", 1)
                col = int(rest.rstrip("]"))
            fxs = [fx for fx in sim.fixes
                   if getattr(fx, "id", None) == base]
            if not fxs or not hasattr(fxs[0], "grid_data"):
                raise ValueError(f"unknown grid source {base!r}")
            g = fxs[0].grid_data(dname, col)
            if shape is None:
                shape = g.shape
            cols.append(np.asarray(g).reshape(-1))
        nz, ny, nx = shape
        lo = np.asarray(jax.device_get(sim.state.box.lo), np.float64)
        hi = np.asarray(jax.device_get(sim.state.box.hi), np.float64)
        path = self.path.replace("*", str(sim.step))
        mode = "w" if ("*" in self.path or not self._opened) else "a"
        self._opened = True
        with open(path, mode) as fh:
            fh.write("ITEM: TIMESTEP\n%d\n" % sim.step)
            fh.write("ITEM: BOX BOUNDS pp pp pp\n")
            for d in range(3):
                fh.write(f"{lo[d]:.16e} {hi[d]:.16e}\n")
            fh.write("ITEM: DIMENSION\n%d\n" % sim.dimension)
            fh.write(f"ITEM: GRID SIZE nx ny nz\n{nx} {ny} {nz}\n")
            fh.write("ITEM: GRID CELLS " + " ".join(self.fields) + "\n")
            np.savetxt(fh, np.column_stack(cols), fmt=self.float_fmt)
