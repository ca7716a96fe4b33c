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


def _resolve_input(sim, name):
    """Per-atom or scalar input: c_ID[, col], f_ID, v_name, or a direct
    thermo/per-atom keyword."""
    from tpumd.script.formula import SimFormulaContext
    if name.startswith("c_"):
        base = name[2:]
        col = None
        if "[" in base:
            base, rest = base.split("[", 1)
            col = int(rest.rstrip("]")) - 1
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
        # samples at steps nfreq*k - j*nevery, j in 0..nrepeat-1
        if step <= 0 or step % self.nevery:
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
    """fix ave/time Nevery Nrepeat Nfreq value1 ... (mode scalar)."""

    name = "ave/time"

    def host_end_of_step(self, sim):
        if not self._sample_due(sim.step):
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
