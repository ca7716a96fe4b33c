"""Host-scheduled observer fixes: ave/time, ave/atom, ave/chunk, print,
halt (references: src/fix_ave_time.cpp, fix_ave_atom.cpp,
fix_ave_chunk.cpp, fix_print.cpp, fix_halt.cpp).

These fixes only act every Nevery steps and never touch the dynamics, so
they run HOST-side: the run loop segments the compiled scan at their
sampling steps and calls ``host_end_of_step`` (the analog of Modify's
end_of_step list for output-class fixes)."""

from __future__ import annotations

import numpy as np

from tpumd.md.fixes import Fix


def _group_mask(sim, fx):
    """(N,) tag-order bool mask of the fix's group membership."""
    import jax as _jax
    s = sim.state
    tag = np.asarray(_jax.device_get(s.tag))
    valid = tag > 0
    order = np.nonzero(valid)[0][np.argsort(tag[valid])]
    if getattr(fx, "groupbit", 1) == 1:
        return np.ones(order.size, bool)
    gm = np.asarray(_jax.device_get(s.gmask))[order]
    return (gm & fx.groupbit) > 0


def _resolve_input(sim, name):
    """Per-atom or scalar input: c_ID[, col], f_ID, v_name, or a direct
    thermo/per-atom keyword."""
    from tpumd.script.formula import SimFormulaContext
    if name.startswith("c_"):
        base = name[2:]
        col = None
        if "[" in base:
            base, rest = base.split("[", 1)
            rest = rest.rstrip("]")
            col = None if rest == "*" else int(rest) - 1
        out = np.asarray(sim.computes[base].evaluate(sim))
        if col is not None:
            out = out[..., col] if out.ndim > 1 else out[col]
        return out
    if name.startswith("v_"):
        return np.asarray(sim.script.evaluate_variable(name[2:]))
    if name.startswith("f_"):
        for fx in sim.fixes:
            if getattr(fx, "id", None) == name[2:]:
                return np.asarray(fx.output(sim))
        raise ValueError(f"unknown fix output {name}")
    ctx = SimFormulaContext(sim, sim.script)
    pa = ctx.peratom(name)
    if pa is not None:
        return pa
    tv = ctx.thermo_keyword(name)
    if tv is None:
        raise ValueError(f"unknown input {name!r}")
    return np.asarray(tv)


class _AveBase(Fix):
    # FixAveTime::setup invokes end_of_step once when the run starts on
    # an output step (nvalid == ntimestep), producing the step-0 rows
    invoke_at_setup = True

    def __init__(self, nevery, nrepeat, nfreq, inputs, file=None,
                 mode="ave"):
        self.nevery = int(nevery)
        self.nrepeat = int(nrepeat)
        self.nfreq = int(nfreq)
        self.inputs = list(inputs)
        self.file = file
        self.host_every = self.nevery
        self._samples = []
        self._result = None
        self._fh = None

    def _sample_due(self, step):
        # samples at steps nfreq*k - j*nevery, j in 0..nrepeat-1;
        # step 0 is a valid output step when invoked from setup
        if step == 0:
            return True
        if step < 0 or step % self.nevery:
            return False
        r = step % self.nfreq
        if r == 0:
            return True
        return r >= self.nfreq - (self.nrepeat - 1) * self.nevery

    def output(self, sim):
        if self._result is None:
            raise ValueError(f"fix {getattr(self, 'id', '?')}: no average yet")
        return self._result

    def _emit(self, sim, row):
        if self.file:
            if self._fh is None:
                self._fh = open(self.file, "w")
                self._fh.write("# step " + " ".join(self.inputs) + "\n")
            self._fh.write(f"{sim.step} " + " ".join(
                f"{v:.10g}" for v in np.atleast_1d(row).ravel()) + "\n")
            self._fh.flush()


class FixAveTime(_AveBase):
    """fix ave/time Nevery Nrepeat Nfreq value1 ... — mode scalar, or
    mode vector writing the reference's vector-file layout
    (src/fix_ave_time.cpp invoke_vector: per Nfreq a `TimeStep
    Number-of-rows` header + `Row value...` lines)."""

    name = "ave/time"

    def __init__(self, nevery, nrepeat, nfreq, inputs, file=None,
                 mode_vector=False):
        super().__init__(nevery, nrepeat, nfreq, inputs, file=file)
        self.mode_vector = mode_vector

    def _vector_sample(self, sim):
        cols = []
        for nm in self.inputs:
            v = np.asarray(_resolve_input(sim, nm), np.float64)
            cols.append(v[:, None] if v.ndim == 1 else v)
        return np.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]

    def _emit_vector(self, sim, arr):
        if not self.file:
            return
        if self._fh is None:
            self._fh = open(self.file, "w")
            self._fh.write(f"# Time-averaged data for fix "
                           f"{getattr(self, 'id', '')}\n")
            self._fh.write("# TimeStep Number-of-rows\n")
            self._fh.write("# Row " + " ".join(self.inputs) + "\n")
        arr = np.atleast_2d(arr)
        self._fh.write(f"{sim.step} {arr.shape[0]}\n")
        for i, row in enumerate(arr, 1):
            self._fh.write(f"{i} " + " ".join(
                f"{v:g}" for v in row) + "\n")
        self._fh.flush()

    def host_end_of_step(self, sim):
        if not self._sample_due(sim.step):
            return
        if self.mode_vector:
            self._samples.append(self._vector_sample(sim))
            if sim.step % self.nfreq == 0:
                self._result = np.mean(self._samples[-self.nrepeat:],
                                       axis=0)
                self._samples = []
                self._emit_vector(sim, self._result)
            return
        vals = np.array(
            [float(np.asarray(_resolve_input(sim, nm),
                              np.float64).ravel()[0])
             for nm in self.inputs])
        self._samples.append(vals)
        if sim.step % self.nfreq == 0:
            self._result = np.mean(self._samples[-self.nrepeat:], axis=0)
            if self._result.size == 1:
                self._result = float(self._result[0])
            self._samples = []
            self._emit(sim, self._result)


class FixAveAtom(_AveBase):
    """fix ave/atom Nevery Nrepeat Nfreq value1 ... — per-atom averages."""

    name = "ave/atom"

    def host_end_of_step(self, sim):
        if not self._sample_due(sim.step):
            return
        cols = [np.asarray(_resolve_input(sim, nm), np.float64)
                for nm in self.inputs]
        self._samples.append(np.stack(cols, axis=-1))
        if sim.step % self.nfreq == 0:
            self._result = np.mean(self._samples[-self.nrepeat:], axis=0)
            self._samples = []


class FixAveChunk(_AveBase):
    """fix ave/chunk Nevery Nrepeat Nfreq chunkID value1 ...; averages
    per-atom values over chunks (density/number counts atoms)."""

    name = "ave/chunk"

    def __init__(self, nevery, nrepeat, nfreq, chunk_id, inputs, file=None):
        super().__init__(nevery, nrepeat, nfreq, inputs, file)
        self.chunk_id = chunk_id

    def host_end_of_step(self, sim):
        if not self._sample_due(sim.step):
            return
        chunk = sim.computes[self.chunk_id]
        ids = np.asarray(chunk.evaluate(sim)).astype(np.int64)
        nchunk = chunk.nchunk
        counts = np.bincount(ids - 1, minlength=nchunk).astype(np.float64)
        cols = []
        for nm in self.inputs:
            if nm in ("density/number", "count"):
                cols.append(counts)
                continue
            v = np.asarray(_resolve_input(sim, nm), np.float64)
            sums = np.bincount(ids - 1, weights=v, minlength=nchunk)
            cols.append(np.where(counts > 0, sums / np.maximum(counts, 1),
                                 0.0))
        self._samples.append(np.stack(cols, axis=-1))
        if sim.step % self.nfreq == 0:
            self._result = np.mean(self._samples[-self.nrepeat:], axis=0)
            self._samples = []
            self._emit(sim, self._result)


class FixPrint(Fix):
    """fix print N "string" — variable-interpolated periodic output."""

    name = "print"

    def __init__(self, nevery, text, file=None):
        self.host_every = int(nevery)
        self.text = text.strip('"')
        self.file = file
        self._fh = None

    def host_end_of_step(self, sim):
        if sim.step % self.host_every:
            return
        line = sim.script.substitute(self.text)
        if self.file:
            if self._fh is None:
                self._fh = open(self.file, "w")
            self._fh.write(line + "\n")
            self._fh.flush()
        else:
            sim._log(line)


class FixHalt(Fix):
    """fix halt N attribute op value (src/fix_halt.cpp): stop the run
    cleanly when the condition becomes true."""

    name = "halt"
    _OPS = {"<": np.less, "<=": np.less_equal, ">": np.greater,
            ">=": np.greater_equal, "==": np.equal, "!=": np.not_equal}

    def __init__(self, nevery, attr, op, value, error="hard"):
        self.host_every = int(nevery)
        self.attr = attr
        self.op = op
        self.value = float(value)
        self.error = error

    def host_end_of_step(self, sim):
        if sim.step % self.host_every:
            return
        cur = float(np.asarray(_resolve_input(sim, self.attr)).ravel()[0])
        if self._OPS[self.op](cur, self.value):
            sim._halt = (f"fix halt condition "
                         f"{self.attr} {self.op} {self.value} met "
                         f"(value {cur:.6g}) at step {sim.step}")


class FixAveHisto(_AveBase):
    """fix ave/histo Nevery Nrepeat Nfreq lo hi Nbin value1 ...
    (src/fix_ave_histo.cpp): histograms scalar/per-atom inputs over the
    Nrepeat samples of each Nfreq window; output file rows match the
    reference's '# Bin Coord Count Count/Total' layout.  Default
    ave=one, beyond=ignore; mode follows the inputs' shapes."""

    name = "ave/histo"

    def __init__(self, nevery, nrepeat, nfreq, lo, hi, nbin, inputs,
                 file=None, beyond="ignore"):
        super().__init__(nevery, nrepeat, nfreq, inputs, file)
        self.lo = float(lo)
        self.hi = float(hi)
        self.nbins = int(nbin)
        self.beyond = beyond
        if beyond == "extra":
            self.nbins += 2
        self._reset_window()

    def _reset_window(self):
        self._bins = np.zeros(self.nbins)
        self._stats = np.array([0.0, 0.0, np.inf, -np.inf])

    def _bin_values(self, vals):
        v = np.asarray(vals, np.float64).ravel()
        if v.size == 0:
            return
        self._stats[2] = min(self._stats[2], v.min())
        self._stats[3] = max(self._stats[3], v.max())
        below = v < self.lo
        above = v > self.hi
        inside = ~(below | above)
        binsize = (self.hi - self.lo) / (self.nbins
                                         - (2 if self.beyond == "extra"
                                            else 0))
        ib = np.minimum(((v[inside] - self.lo) / binsize).astype(int),
                        (self.nbins - (2 if self.beyond == "extra"
                                       else 0)) - 1)
        if self.beyond == "ignore":
            self._stats[1] += below.sum() + above.sum()
            np.add.at(self._bins, ib, 1.0)
            self._stats[0] += inside.sum()
        elif self.beyond == "end":
            self._bins[0] += below.sum()
            self._bins[-1] += above.sum()
            np.add.at(self._bins, ib, 1.0)
            self._stats[0] += v.size
        else:  # extra
            self._bins[0] += below.sum()
            self._bins[-1] += above.sum()
            np.add.at(self._bins, ib + 1, 1.0)
            self._stats[0] += v.size

    def host_end_of_step(self, sim):
        if not self._sample_due(sim.step):
            return
        gsel = _group_mask(sim, self)
        for nm in self.inputs:
            vals = np.asarray(_resolve_input(sim, nm), np.float64)
            if vals.ndim and vals.shape[0] == gsel.shape[0]:
                vals = vals[gsel]
            self._bin_values(vals)
        if sim.step % self.nfreq == 0:
            binsize = (self.hi - self.lo) / (
                self.nbins - (2 if self.beyond == "extra" else 0))
            if self.beyond == "extra":
                coords = np.concatenate(
                    [[self.lo - 0.5 * binsize],
                     self.lo + (np.arange(self.nbins - 2) + 0.5) * binsize,
                     [self.hi + 0.5 * binsize]])
            else:
                coords = self.lo + (np.arange(self.nbins) + 0.5) * binsize
            total = self._stats[0]
            frac = self._bins / total if total else np.zeros_like(self._bins)
            self._result = np.column_stack([coords, self._bins, frac])
            if self.file:
                if self._fh is None:
                    self._fh = open(self.file, "w")
                    self._fh.write("# Histogrammed data for fix "
                                   f"{getattr(self, 'id', '?')}\n")
                    self._fh.write("# TimeStep Number-of-bins "
                                   "Total-counts Missing-counts "
                                   "Min-value Max-value\n")
                    self._fh.write("# Bin Coord Count Count/Total\n")
                st = self._stats
                mn = st[2] if np.isfinite(st[2]) else 0.0
                mx = st[3] if np.isfinite(st[3]) else 0.0
                self._fh.write(f"{sim.step} {self.nbins} {st[0]:g} "
                               f"{st[1]:g} {mn:g} {mx:g}\n")
                for i in range(self.nbins):
                    self._fh.write(f"{i+1} {coords[i]:g} "
                                   f"{self._bins[i]:g} {frac[i]:g}\n")
                self._fh.flush()
            self._reset_window()


class FixStoreState(Fix):
    """fix store/state N input1 ... (src/fix_store_state.cpp): snapshot
    per-atom values every N steps (N=0: once at definition) into a
    tag-ordered array readable as f_ID."""

    name = "store/state"

    _UNWRAP = {"xu": 0, "yu": 1, "zu": 2}

    def __init__(self, nevery, inputs):
        self.nevery = int(nevery)
        self.host_every = max(self.nevery, 0)
        self.inputs = list(inputs)
        self._stored = None

    def _grab(self, sim):
        import jax as _jax
        s = sim.state
        tag = np.asarray(_jax.device_get(s.tag))
        valid = tag > 0
        order = np.nonzero(valid)[0][np.argsort(tag[valid])]
        cols = []
        for nm in self.inputs:
            if nm in self._UNWRAP:
                c = self._UNWRAP[nm]
                x = np.asarray(_jax.device_get(s.x), np.float64)[order, c]
                img = np.asarray(_jax.device_get(s.image))[order, c]
                ell = float(np.asarray(
                    _jax.device_get(s.box.lengths))[c])
                cols.append(x + img * ell)
            else:
                cols.append(np.asarray(
                    _resolve_input(sim, nm), np.float64))
        out = np.stack(cols, axis=-1)
        out = np.where(_group_mask(sim, self)[:, None], out, 0.0)
        return out[:, 0] if out.shape[-1] == 1 else out

    def host_setup(self, sim):
        if self._stored is None:
            self._stored = self._grab(sim)

    def host_end_of_step(self, sim):
        if self.nevery and sim.step % self.nevery == 0:
            self._stored = self._grab(sim)

    def output(self, sim):
        if self._stored is None:
            self.host_setup(sim)
        return self._stored


class FixPropertyAtom(Fix):
    """fix property/atom i_name/d_name ... (src/fix_property_atom.cpp):
    registers custom tag-keyed per-atom columns (default 0), set via the
    set command and readable in dumps/variables as i_name / d_name."""

    name = "property/atom"

    def __init__(self, names):
        self.names = list(names)

    def host_setup(self, sim):
        store = getattr(sim, "custom_peratom", None)
        if store is None:
            store = sim.custom_peratom = {}
        n = sim.natoms
        for nm in self.names:
            if nm not in store:
                dtype = np.int64 if nm.startswith("i_") else np.float64
                store[nm] = np.zeros(n, dtype)


class FixAveGrid(_AveBase):
    """fix ave/grid Nevery Nrepeat Nfreq Nx Ny Nz value1 ... [norm all]
    (src/fix_ave_grid.cpp, ATOM mode): bins atoms onto a regular grid
    each sample step and time-averages per-cell values; dump grid reads
    the result via grid_data("data"/"count")."""

    name = "ave/grid"

    def __init__(self, nevery, nrepeat, nfreq, nx, ny, nz, inputs,
                 norm="all"):
        super().__init__(nevery, nrepeat, nfreq, inputs)
        self.nx, self.ny, self.nz = int(nx), int(ny), int(nz)
        if norm != "all":
            raise ValueError("fix ave/grid: only norm all supported")
        nv = len(self.inputs)
        self._sum = np.zeros((self.nz, self.ny, self.nx, nv))
        self._count = np.zeros((self.nz, self.ny, self.nx))
        self._grid = None
        self._gridcount = None

    def host_end_of_step(self, sim):
        if not self._sample_due(sim.step):
            return
        import jax
        s = sim.state
        tag = np.asarray(jax.device_get(s.tag))
        valid = tag > 0
        x = np.asarray(jax.device_get(s.x), np.float64)[valid]
        v = np.asarray(jax.device_get(s.v), np.float64)[valid]
        typ = np.asarray(jax.device_get(s.type))[valid]
        order = np.argsort(tag[valid])     # tag order for c_/f_ refs
        x, v, typ = x[order], v[order], typ[order]
        m = sim.mass[typ]
        lo = np.asarray(jax.device_get(s.box.lo), np.float64)
        prd = np.asarray(jax.device_get(s.box.lengths), np.float64)
        dims = np.array([self.nx, self.ny, self.nz])
        rel = (x - lo) / prd
        rel = rel - np.floor(rel)          # wrap into [0,1)
        cell = np.minimum((rel * dims).astype(np.int64), dims - 1)
        flat = (cell[:, 2] * self.ny + cell[:, 1]) * self.nx + cell[:, 0]

        np.add.at(self._count.reshape(-1), flat, 1.0)
        for k, name in enumerate(self.inputs):
            if name == "density/number":
                val = np.ones(len(x))
            elif name in ("density/mass", "mass"):
                val = m
            elif name == "temp":
                val = m * np.sum(v * v, axis=1)
            elif name in ("vx", "vy", "vz"):
                val = v[:, "xyz".index(name[1])]
            else:
                val = np.asarray(_input(sim, name))
            np.add.at(self._sum.reshape(-1, len(self.inputs))[:, k],
                      flat, val)

        if sim.step % self.nfreq == 0:
            u = sim.units
            rep = float(self.nrepeat)
            binvol = np.prod(prd / dims)
            cnt = self._count
            out = np.zeros_like(self._sum)
            adof = sim.dimension
            for k, name in enumerate(self.inputs):
                sk = self._sum[..., k]
                if name == "density/number":
                    out[..., k] = sk / (binvol * rep)
                elif name == "density/mass":
                    out[..., k] = sk * u.mv2d / (binvol * rep)
                elif name == "temp":
                    dof = adof * cnt * u.boltz
                    out[..., k] = np.where(
                        cnt > 0, u.mvv2e * sk / np.maximum(dof, 1e-300),
                        0.0)
                else:
                    out[..., k] = np.where(cnt > 0,
                                           sk / np.maximum(cnt, 1), 0.0)
            self._grid = out
            self._gridcount = cnt / rep
            self._sum[:] = 0.0
            self._count[:] = 0.0

    def grid_data(self, which, index=None):
        if self._grid is None:
            # before the first Nfreq output the reference dumps zeros
            z = np.zeros((self.nz, self.ny, self.nx))
            return z
        if which == "count":
            return self._gridcount
        if index is None:
            return self._grid[..., 0]
        return self._grid[..., index - 1]

    def output(self, sim):
        return self.grid_data("data")


class FixTuneKspace(Fix):
    """fix tune/kspace N (src/KSPACE/fix_tune_kspace.cpp): time the
    long-range solvers in place and keep the fastest.

    The reference cycles ewald -> pppm -> msm (swapping the pair style
    to its msm variant, fix_tune_kspace.cpp:101-195) and Newton-adjusts
    the coulomb cutoff between trials.  This build times ewald vs pppm
    on the SAME pair style — msm needs a different real-space kernel —
    and installs the winner; cutoff adjustment is out of scope.  Each
    trial window is N steps; the swap itself re-runs setup(), exactly
    like the reference's kspace re-init."""

    name = "tune/kspace"

    def __init__(self, nevery):
        self.host_every = int(nevery)
        self._t_last = None
        self._times = {}
        self._phase = 0        # 0: timing current, 1: timing alt, 2: done

    @staticmethod
    def _make(style, accuracy):
        if style == "pppm":
            from tpumd.models.kspace_pppm import PPPM
            return PPPM(accuracy)
        from tpumd.models.kspace_ewald import Ewald
        return Ewald(accuracy)

    def host_end_of_step(self, sim):
        import time as _time
        if self._phase == 2 or sim.kspace is None:
            return
        now = _time.perf_counter()
        cur = ("pppm" if type(sim.kspace).__name__.startswith("PPPM")
               else "ewald")
        if self._t_last is None:
            self._t_last = now
            return
        self._times[cur] = now - self._t_last
        acc = sim.kspace.accuracy_relative
        if self._phase == 0:
            other = "ewald" if cur == "pppm" else "pppm"
            sim.kspace = self._make(other, acc)
            sim._ctx = None          # force re-setup with the new solver
            self._phase = 1
            self._t_last = None      # first window after a swap includes
            # compile time — restart the clock at the next boundary
            sim._log(f"fix tune/kspace: timing {other}")
        else:
            best = min(self._times, key=self._times.get)
            if best != cur:
                sim.kspace = self._make(best, acc)
                sim._ctx = None
            self._phase = 2
            t = {k: round(v, 3) for k, v in self._times.items()}
            sim._log(f"fix tune/kspace: times {t} -> keeping {best}")


class FixBalance(Fix):
    """fix balance N thresh rcb|shift|x|y|z (src/fix_balance.cpp):
    periodic dynamic rebalancing.  Every N steps the current imbalance
    of the equal-count row blocks is measured; above ``thresh`` the
    state rows are re-permuted with the same RCB / dim-sort machinery
    as the `balance` command and the simulation re-sets-up (the analog
    of Balance::balance + Irregular::migrate_atoms mid-run).  On the
    cell-grid engine this is a no-op by construction (equal slots =
    equal dense compute)."""

    name = "balance"

    def __init__(self, nevery, thresh, style, dims=""):
        self.host_every = int(nevery)
        self.thresh = float(thresh)
        self.style = "shift" if style in ("x", "y", "z") else str(style)
        self.dims = dims or (style if style in ("x", "y", "z") else "")
        self.last = (None, None)

    def host_end_of_step(self, sim):
        if sim.step % self.host_every:
            return
        if sim._ctx is not None and sim._ctx.is_cellgrid:
            return                      # balanced by construction
        from tpumd.parallel.balance import slab_imbalance
        import numpy as np
        import jax
        x = np.asarray(jax.device_get(sim.state.x), np.float64)
        nparts = max(len(jax.devices()), 1)
        cur = slab_imbalance(x, np.arange(len(x)), nparts)
        if cur <= self.thresh:
            return
        from tpumd.parallel.balance import balance_atoms
        before, after = balance_atoms(sim, self.style, dims=self.dims)
        self.last = (before, after)
        sim._log(f"fix balance: imbalance {before:.4g} -> {after:.4g}")


class FixAveCorrelate(Fix):
    """fix ave/correlate Nevery Nrepeat Nfreq v1 v2 ... [type auto|
    upper|auto/upper] [ave one|running] [file f]
    (src/fix_ave_correlate.cpp): time correlations of global scalars.

    Samples every Nevery steps; at each sample the newest value vector
    is multiplied against the previous Nrepeat stored samples to
    accumulate C_jk(m*Nevery*dt); every Nfreq the correlation table is
    written (Index TimeDelta Ncount columns) and, with ave one,
    reset."""

    name = "ave/correlate"

    def __init__(self, nevery, nrepeat, nfreq, inputs, ctype="auto",
                 ave="one", file=None):
        self.host_every = int(nevery)
        self.nevery = int(nevery)
        self.nrepeat = int(nrepeat)
        self.nfreq = int(nfreq)
        self.inputs = list(inputs)
        self.ctype = ctype
        self.ave = ave
        self.file = file
        self._fh = None
        nv = len(self.inputs)
        if ctype == "auto":
            self.pairs = [(i, i) for i in range(nv)]
        elif ctype == "upper":
            self.pairs = [(i, j) for i in range(nv)
                          for j in range(i + 1, nv)]
        else:                       # auto/upper
            self.pairs = [(i, j) for i in range(nv)
                          for j in range(i, nv)]
        self._reset()

    def _reset(self):
        self._hist = []            # newest first
        self._corr = np.zeros((self.nrepeat, len(self.pairs)))
        self._count = np.zeros(self.nrepeat, dtype=np.int64)

    def _sample(self, vals):
        self._hist.insert(0, vals)
        del self._hist[self.nrepeat:]
        for m, old in enumerate(self._hist):
            for c, (i, j) in enumerate(self.pairs):
                # accumulate v_i(t-m) * v_j(t): the OLDER sample takes
                # the first index (fix_ave_correlate.cpp accumulate)
                self._corr[m, c] += old[i] * vals[j]
            self._count[m] += 1

    def _step_sample(self, sim):
        vals = np.array(
            [float(np.asarray(_resolve_input(sim, nm),
                              np.float64).ravel()[0])
             for nm in self.inputs])
        self._sample(vals)
        if self.nfreq and sim.step % self.nfreq == 0:
            self._emit(sim)
            if self.ave == "one":
                # the window-closing sample seeds the next window
                # (FixAveCorrelate ave one: nsample=1 keeps the current
                # values as the first entry after an output)
                self._reset()
                self._sample(vals)

    def host_setup_sample(self, sim):
        # Reference setup(): the step-0 sample + first output block
        self._step_sample(sim)

    def host_end_of_step(self, sim):
        if sim.step % self.nevery:
            return
        self._step_sample(sim)

    def _emit(self, sim):
        cnt = np.maximum(self._count, 1)
        table = self._corr / cnt[:, None]
        self._result = table
        if not self.file:
            return
        if self._fh is None:
            self._fh = open(self.file, "w")
            self._fh.write("# Time-correlated data for fix "
                           f"{getattr(self, 'id', '')}\n")
            self._fh.write("# Timestep Number-of-time-windows\n")
            self._fh.write("# Index TimeDelta Ncount "
                           + " ".join(f"{self.inputs[i]}*{self.inputs[j]}"
                                      for i, j in self.pairs) + "\n")
        self._fh.write(f"{sim.step} {self.nrepeat}\n")
        for m in range(self.nrepeat):
            self._fh.write(
                f"{m + 1} {m * self.nevery} {int(self._count[m])} "
                + " ".join(f"{v:g}" for v in table[m]) + "\n")
        self._fh.flush()
