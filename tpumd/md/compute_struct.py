"""Structure-identification per-atom computes: cna/atom, centro/atom,
orientorder/atom.

References: src/compute_cna_atom.cpp (FCC/HCP/BCC/ICOS CNA signatures),
src/compute_centro_atom.cpp (Kelchner centrosymmetry over the nnn
nearest neighbors), src/compute_orientorder_atom.cpp (Steinhardt
Q_l bond-orientational order).

Like the rest of the compute library these evaluate host-side at output
steps on a dense O(N^2) adjacency (fixture-scale analysis passes; hot
per-step quantities live in the compiled loop instead).  Results are in
tag order.
"""

from __future__ import annotations

import jax
import numpy as np

from tpumd.md.compute_styles import Compute
from tpumd.md.compute_pair import _host_atoms, _min_image

MAXNEAR = 16      # src/compute_cna_atom.cpp:36
MAXCOMMON = 8


def _adjacency(sim, cutoff):
    """Dense within-cutoff adjacency + displacement table (tag order)."""
    x, typ, tag, gm, ell, per, sp = _host_atoms(sim)
    n = len(x)
    d = x[:, None, :] - x[None, :, :]
    d = _min_image(d, ell, per)
    r2 = (d * d).sum(-1)
    np.fill_diagonal(r2, np.inf)
    adj = r2 < cutoff * cutoff
    return x, gm, d, r2, adj


class ComputeCNAAtom(Compute):
    """compute ID group cna/atom cutoff -> per-atom pattern
    0=unknown (outside group) 1=fcc 2=hcp 3=bcc 4=icos 5=other."""

    style = "cna/atom"
    scalar = False

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.cutoff = float(args[0])

    def evaluate(self, sim):
        x, gm, d, r2, adj = _adjacency(sim, self.cutoff)
        n = len(x)
        gbit = sim.groups.get(self.group, 1)
        insel = np.ones(n, bool) if self.group == "all" \
            else (gm & gbit) > 0
        # per-atom nearest lists capped at MAXNEAR in index order
        # (reference caps at 16 in neighbor-list order)
        nears = []
        for i in range(n):
            idx = np.nonzero(adj[i])[0][:MAXNEAR]
            nears.append(idx)
        nnear = np.array([len(v) for v in nears])
        out = np.zeros(n)
        for i in range(n):
            if not insel[i]:
                continue
            if nnear[i] != 12 and nnear[i] != 14:
                out[i] = 5.0
                continue
            sigs = []
            seti = set(nears[i].tolist())
            for j in nears[i]:
                common = np.array(sorted(
                    seti & set(nears[j].tolist())), int)[:MAXCOMMON]
                nc = len(common)
                if nc:
                    B = adj[np.ix_(common, common)]
                    bonds = B.sum(1)
                    nb = int(bonds.sum()) // 2
                    mx, mn = int(bonds.max()), int(bonds.min())
                else:
                    nb, mx, mn = 0, 0, MAXCOMMON
                sigs.append((nc, nb, mx, mn))
            pat = 5.0
            if nnear[i] == 12:
                nfcc = sigs.count((4, 2, 1, 1))
                nhcp = sigs.count((4, 2, 2, 0))
                nico = sigs.count((5, 5, 2, 2))
                if nfcc == 12:
                    pat = 1.0
                elif nfcc == 6 and nhcp == 6:
                    pat = 2.0
                elif nico == 12:
                    pat = 4.0
            else:
                nb4 = sigs.count((4, 4, 2, 2))
                nb6 = sigs.count((6, 6, 2, 2))
                if nb4 == 6 and nb6 == 8:
                    pat = 3.0
            out[i] = pat
        return out


class ComputeCentroAtom(Compute):
    """compute ID group centro/atom {fcc|bcc|N}: Kelchner
    centrosymmetry = sum of the nnn/2 smallest |R_j + R_k|^2 over the
    nnn nearest neighbors (0 if fewer in force cutoff)."""

    style = "centro/atom"
    scalar = False

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        lattice = args[0] if args else "fcc"
        self.nnn = {"fcc": 12, "bcc": 8}.get(lattice)
        if self.nnn is None:
            self.nnn = int(lattice)
        if self.nnn % 2 or self.nnn <= 0:
            raise ValueError("centro/atom N must be positive and even")

    def evaluate(self, sim):
        cutoff = sim.pair.cutforce if hasattr(sim.pair, "cutforce") \
            else np.sqrt(float(np.max(np.asarray(sim.pair.cutsq))))
        x, gm, d, r2, adj = _adjacency(sim, float(cutoff))
        n = len(x)
        nnn = self.nnn
        gbit = sim.groups.get(self.group, 1)
        insel = np.ones(n, bool) if self.group == "all" \
            else (gm & gbit) > 0
        out = np.zeros(n)
        nhalf = nnn // 2
        enough = adj.sum(1) >= nnn
        jj, kk = np.triu_indices(nnn, 1)
        for i in range(n):
            if not (insel[i] and enough[i]):
                continue
            cand = np.nonzero(adj[i])[0]
            sel = cand[np.argpartition(r2[i][cand], nnn - 1)[:nnn]]
            # pairs: |(xj - xi) + (xk - xi)|^2 over the nnn nearest
            rv = -d[i][sel]                      # xj - xi
            pr = rv[jj] + rv[kk]
            p2 = (pr * pr).sum(-1)
            out[i] = np.sort(p2)[:nhalf].sum()
        return out


class ComputeOrientOrderAtom(Compute):
    """compute ID group orientorder/atom [nnn N|NULL] [degrees k l1..lk]
    [cutoff R]: per-atom Steinhardt Q_l columns (wl/wlhat/components
    unsupported)."""

    style = "orientorder/atom"
    scalar = False

    def __init__(self, cid, group, args=()):
        super().__init__(cid, group)
        self.nnn = 12
        self.qlist = (4, 6, 8, 10, 12)
        self.cutoff_user = None
        args = list(args)
        i = 0
        while i < len(args):
            k = args[i]
            if k == "nnn":
                self.nnn = None if args[i + 1] == "NULL" \
                    else int(args[i + 1])
                i += 2
            elif k == "degrees":
                nq = int(args[i + 1])
                self.qlist = tuple(
                    int(v) for v in args[i + 2:i + 2 + nq])
                i += 2 + nq
            elif k == "cutoff":
                self.cutoff_user = float(args[i + 1])
                i += 2
            else:
                raise ValueError(
                    f"orientorder/atom keyword {k!r} not supported")

    def evaluate(self, sim):
        from scipy.special import sph_harm_y
        cutoff = self.cutoff_user
        if cutoff is None:
            cutoff = sim.pair.cutforce if hasattr(sim.pair, "cutforce") \
                else np.sqrt(float(np.max(np.asarray(sim.pair.cutsq))))
        x, gm, d, r2, adj = _adjacency(sim, float(cutoff))
        n = len(x)
        gbit = sim.groups.get(self.group, 1)
        insel = np.ones(n, bool) if self.group == "all" \
            else (gm & gbit) > 0
        out = np.zeros((n, len(self.qlist)))
        for i in range(n):
            if not insel[i]:
                continue
            cand = np.nonzero(adj[i])[0]
            if self.nnn is not None:
                if len(cand) < self.nnn:
                    continue
                cand = cand[np.argpartition(
                    r2[i][cand], self.nnn - 1)[:self.nnn]]
            elif len(cand) == 0:
                continue
            rv = -d[i][cand]                       # xj - xi
            rmag = np.sqrt((rv * rv).sum(-1))
            theta = np.arccos(np.clip(rv[:, 2] / rmag, -1.0, 1.0))
            phi = np.arctan2(rv[:, 1], rv[:, 0])
            for il, l in enumerate(self.qlist):
                qsum = 0.0
                for m in range(0, l + 1):
                    ylm = sph_harm_y(l, m, theta, phi)
                    q = ylm.mean()
                    w = 1.0 if m == 0 else 2.0
                    qsum += w * (q.real * q.real + q.imag * q.imag)
                out[i, il] = np.sqrt(
                    4.0 * np.pi / (2 * l + 1) * qsum)
        return out
