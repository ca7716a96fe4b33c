"""pair_style table: tabulated pair potentials (src/pair_table.cpp).

Table files are read and re-sampled onto N-1 evenly spaced bins in rsq
with the reference's natural-spline machinery (spline/splint,
compute_table) so LOOKUP/LINEAR/SPLINE evaluation matches digit for
digit.  Evaluation gathers per-pair rows from the (ntables, N) value
arrays — matrix engine only (table gathers are host/CPU friendly;
TPU decks should prefer analytic styles or segment-polynomial refits).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpumd.models.base import PairStyle
from tpumd.models.registry import register_pair


def _spline(x, y, yp1, ypn):
    """Reference PairTable::spline (NR cubic spline second derivatives)."""
    n = len(x)
    y2 = np.zeros(n)
    u = np.zeros(n)
    if yp1 > 0.99e30:
        y2[0] = u[0] = 0.0
    else:
        y2[0] = -0.5
        u[0] = (3.0 / (x[1] - x[0])) * ((y[1] - y[0]) / (x[1] - x[0]) - yp1)
    for i in range(1, n - 1):
        sig = (x[i] - x[i - 1]) / (x[i + 1] - x[i - 1])
        p = sig * y2[i - 1] + 2.0
        y2[i] = (sig - 1.0) / p
        ui = ((y[i + 1] - y[i]) / (x[i + 1] - x[i])
              - (y[i] - y[i - 1]) / (x[i] - x[i - 1]))
        u[i] = (6.0 * ui / (x[i + 1] - x[i - 1]) - sig * u[i - 1]) / p
    if ypn > 0.99e30:
        qn = un = 0.0
    else:
        qn = 0.5
        un = (3.0 / (x[n - 1] - x[n - 2])) * (
            ypn - (y[n - 1] - y[n - 2]) / (x[n - 1] - x[n - 2]))
    y2[n - 1] = (un - qn * u[n - 2]) / (qn * y2[n - 2] + 1.0)
    for k in range(n - 2, -1, -1):
        y2[k] = y2[k] * y2[k + 1] + u[k]
    return y2


def _splint(xa, ya, y2a, x):
    khi = np.searchsorted(xa, x)
    khi = np.clip(khi, 1, len(xa) - 1)
    klo = khi - 1
    h = xa[khi] - xa[klo]
    a = (xa[khi] - x) / h
    b = (x - xa[klo]) / h
    return (a * ya[klo] + b * ya[khi]
            + ((a**3 - a) * y2a[klo] + (b**3 - b) * y2a[khi]) * h * h / 6.0)


def read_table_file(path: str, keyword: str):
    """Parse one section of a LAMMPS pair table file."""
    lines = open(path).read().splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].split("#")[0].strip()
        if line == keyword:
            break
        i += 1
    else:
        raise ValueError(f"keyword {keyword!r} not found in {path}")
    params = lines[i + 1].split()
    n = int(params[params.index("N") + 1])
    rflag = rlo = rhi = None
    fpflag, fplo, fphi = False, 0.0, 0.0
    if "R" in params:
        k = params.index("R")
        rflag, rlo, rhi = "R", float(params[k + 1]), float(params[k + 2])
    if "RSQ" in params:
        raise ValueError("RSQ tables not supported yet")
    if "FPRIME" in params:
        k = params.index("FPRIME")
        fpflag, fplo, fphi = True, float(params[k + 1]), float(params[k + 2])
    i += 2
    rows = []
    while len(rows) < n:
        t = lines[i].split()
        if t:
            rows.append([float(t[1]), float(t[2]), float(t[3])])
        i += 1
    arr = np.array(rows)
    return dict(r=arr[:, 0], e=arr[:, 1], f=arr[:, 2], rlo=rlo, rhi=rhi,
                rflag=rflag, fpflag=fpflag, fplo=fplo, fphi=fphi)


@register_pair("table")
class PairTable(PairStyle):
    name = "table"
    supports_cellgrid = False

    def __init__(self, ntypes: int):
        super().__init__(ntypes)
        self.tabindex = np.zeros((ntypes + 1, ntypes + 1), dtype=np.int32)
        self.cut = np.zeros((ntypes + 1, ntypes + 1))
        self.tables = []

    def settings(self, style, n, *rest):
        self.tabstyle = str(style)
        if self.tabstyle not in ("lookup", "linear", "spline"):
            raise ValueError(f"table style {style} not supported")
        self.tablength = int(n)

    def coeff(self, ilo, ihi, jlo, jhi, filename, keyword, *cut):
        tb = read_table_file(str(filename), str(keyword))
        cutoff = float(cut[0]) if cut else (
            tb["rhi"] if tb["rflag"] else tb["r"][-1])
        self.tables.append(self._compute_table(tb, cutoff))
        idx = len(self.tables) - 1
        for i in range(int(ilo), int(ihi) + 1):
            for j in range(max(int(jlo), i), int(jhi) + 1):
                self.tabindex[i, j] = self.tabindex[j, i] = idx
                self.cut[i, j] = self.cut[j, i] = cutoff
                self._setflag[i, j] = self._setflag[j, i] = True

    def _compute_table(self, tb, cutoff):
        """PairTable::compute_table for LINEAR/LOOKUP/SPLINE."""
        r, e, f = tb["r"], tb["e"], tb["f"]
        ninput = len(r)
        ep0, epn = -f[0], -f[-1]
        e2 = _spline(r, e, ep0, epn)
        if tb["fpflag"]:
            fp0, fpn = tb["fplo"], tb["fphi"]
        else:
            fp0 = (f[1] - f[0]) / (r[1] - r[0])
            fpn = (f[-1] - f[-2]) / (r[-1] - r[-2])
        f2 = _spline(r, f, fp0, fpn)

        tlm1 = self.tablength - 1
        inner = tb["rlo"] if tb["rflag"] else r[0]
        innersq = inner * inner
        delta = (cutoff * cutoff - innersq) / tlm1
        out = dict(innersq=innersq, invdelta=1.0 / delta, cut=cutoff)
        nvals = self.tablength
        rsq_t = innersq + np.arange(nvals) * delta
        rt = np.sqrt(rsq_t)
        # match: evenly-R tables with the same length reuse file values
        match = (tb["rflag"] == "R" and ninput == nvals
                 and abs(tb["rhi"] - cutoff) < 1e-12
                 and abs(tb["rlo"] - inner) < 1e-12 and False)
        et = _splint(r, e, e2, rt)
        ft = _splint(r, f, f2, rt) / rt
        if self.tabstyle == "lookup":
            rsq_mid = innersq + (np.arange(tlm1) + 0.5) * delta
            rm = np.sqrt(rsq_mid)
            out["e"] = _splint(r, e, e2, rm)
            out["f"] = _splint(r, f, f2, rm) / rm
        elif self.tabstyle == "linear":
            out.update(rsq=rsq_t, e=et, f=ft,
                       de=et[1:] - et[:-1], df=ft[1:] - ft[:-1])
        else:  # spline over the resampled table (in rsq space)
            e2t = _spline(rsq_t, et, 1e31, 1e31)
            f2t = _spline(rsq_t, ft, 1e31, 1e31)
            out.update(rsq=rsq_t, e=et, f=ft, e2=e2t, f2=f2t,
                       deltasq6=delta * delta / 6.0)
        _ = match
        return out

    def init(self):
        pass

    @property
    def max_cutoff(self) -> float:
        return float(self.cut.max())

    def pair_fn(self, r2, itype, jtype):
        dt_ = r2.dtype
        tabidx = jnp.asarray(self.tabindex)[itype, jtype]
        tlm1 = self.tablength - 1
        innersq = jnp.asarray([t["innersq"] for t in self.tables], dt_)[tabidx]
        invd = jnp.asarray([t["invdelta"] for t in self.tables], dt_)[tabidx]
        cutsq = jnp.asarray(self.cut ** 2, dt_)[itype, jtype]
        inside = r2 < cutsq
        it = jnp.clip(((r2 - innersq) * invd).astype(jnp.int32), 0, tlm1 - 1)
        if self.tabstyle == "lookup":
            ft = jnp.asarray(np.stack([t["f"] for t in self.tables]), dt_)
            et = jnp.asarray(np.stack([t["e"] for t in self.tables]), dt_)
            fpair = ft[tabidx, it]
            e = et[tabidx, it]
        elif self.tabstyle == "linear":
            ft = jnp.asarray(np.stack([t["f"] for t in self.tables]), dt_)
            et = jnp.asarray(np.stack([t["e"] for t in self.tables]), dt_)
            dft = jnp.asarray(np.stack([t["df"] for t in self.tables]), dt_)
            det = jnp.asarray(np.stack([t["de"] for t in self.tables]), dt_)
            rsqt = jnp.asarray(np.stack([t["rsq"] for t in self.tables]), dt_)
            frac = (r2 - rsqt[tabidx, it]) * invd
            fpair = ft[tabidx, it] + frac * dft[tabidx, it]
            e = et[tabidx, it] + frac * det[tabidx, it]
        else:
            ft = jnp.asarray(np.stack([t["f"] for t in self.tables]), dt_)
            et = jnp.asarray(np.stack([t["e"] for t in self.tables]), dt_)
            f2t = jnp.asarray(np.stack([t["f2"] for t in self.tables]), dt_)
            e2t = jnp.asarray(np.stack([t["e2"] for t in self.tables]), dt_)
            rsqt = jnp.asarray(np.stack([t["rsq"] for t in self.tables]), dt_)
            d6 = jnp.asarray([t["deltasq6"] for t in self.tables],
                             dt_)[tabidx]
            b = (r2 - rsqt[tabidx, it]) * invd
            a = 1.0 - b
            fpair = (a * ft[tabidx, it] + b * ft[tabidx, it + 1]
                     + ((a**3 - a) * f2t[tabidx, it]
                        + (b**3 - b) * f2t[tabidx, it + 1]) * d6)
            e = (a * et[tabidx, it] + b * et[tabidx, it + 1]
                 + ((a**3 - a) * e2t[tabidx, it]
                    + (b**3 - b) * e2t[tabidx, it + 1]) * d6)
        fpair = jnp.where(inside, fpair, 0.0)
        e = jnp.where(inside, e, 0.0)
        return fpair, e, None, None
