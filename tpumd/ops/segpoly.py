"""Branchless piecewise-polynomial tables for TPU kernels.

Small-table gathers are catastrophically slow on TPU (~2 ns/row measured
on v5e — a 27M-candidate spline lookup costs ~56 ms), so radial functions
that the reference evaluates via cubic-spline tables
(src/MANYBODY/pair_eam.cpp interpolate()) are refit at setup into a few
uniform polynomial segments evaluated with masked coefficient selection +
Horner — pure VPU math, ~1.4 ms for 27M evaluations at 8 segments x
degree 8.  Fit accuracy is validated against the exact table at fit time
(typically ~1e-9 relative — below f32 roundoff of the kernel itself).
Exact-parity tests use the matrix path with true spline gathers.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True, eq=False)
class SegPoly:
    """coefs[s, j]: ascending-power coefficients of segment s in the local
    coordinate u in [0, 1); domain [lo, hi) split into nseg equal parts."""

    coefs: np.ndarray
    lo: float
    hi: float
    max_rel_err: float

    @property
    def nseg(self) -> int:
        return self.coefs.shape[0]

    @property
    def deg(self) -> int:
        return self.coefs.shape[1] - 1

    def __call__(self, r):
        """Branchless evaluation (clamps r into [lo, hi])."""
        nseg, ncoef = self.coefs.shape
        t = (r - self.lo) * (nseg / (self.hi - self.lo))
        seg = jnp.clip(t.astype(jnp.int32), 0, nseg - 1)
        u = t - seg.astype(t.dtype)
        acc = jnp.zeros_like(r)
        for j in range(ncoef - 1, -1, -1):
            cj = jnp.zeros_like(r)
            for s in range(nseg):
                cj = jnp.where(seg == s, jnp.asarray(self.coefs[s, j], r.dtype),
                               cj)
            acc = acc * u + cj
        return acc


@dataclasses.dataclass(frozen=True, eq=False)
class ChebPoly:
    """Single Chebyshev series over [lo, hi], evaluated by Clenshaw.

    The monomial basis is unusable here: a degree-16 least-squares fit
    carries O(10) alternating coefficients whose f32 Horner evaluation
    loses ~0.03 absolute on values ~1e-2 (catastrophic cancellation).
    Chebyshev coefficients decay with degree and Clenshaw is stable, so
    the same fit evaluates to ~1e-7 absolute in f32 — safe for pallas
    kernels without per-segment selects."""

    coefs: tuple          # c_0..c_deg (hashable for static kernel args)
    lo: float
    hi: float
    max_rel_err: float

    def __call__(self, r):
        t = (r - self.lo) * (2.0 / (self.hi - self.lo)) - 1.0
        t2 = 2.0 * t
        b1 = jnp.zeros_like(r)
        b2 = jnp.zeros_like(r)
        for c in self.coefs[:0:-1]:
            b1, b2 = t2 * b1 - b2 + c, b1
        return t * b1 - b2 + self.coefs[0]


def fit_cheb(fn, lo: float, hi: float, deg: int = 16,
             samples: int = 512) -> ChebPoly:
    """Chebyshev least-squares fit of fn over [lo, hi]."""
    k = np.arange(samples)
    t = -np.cos((2 * k + 1) * np.pi / (2 * samples))
    r = lo + (t + 1.0) * 0.5 * (hi - lo)
    y = fn(r)
    c = np.polynomial.chebyshev.chebfit(t, y, deg)
    tt = np.linspace(-1, 1, 2049)
    yy = fn(lo + (tt + 1.0) * 0.5 * (hi - lo))
    approx = np.polynomial.chebyshev.chebval(tt, c)
    scale = max(float(np.abs(yy).max()), 1e-30)
    err = float(np.abs(approx - yy).max() / scale)
    return ChebPoly(coefs=tuple(float(v) for v in c), lo=float(lo),
                    hi=float(hi), max_rel_err=err)


def fit_segpoly(fn, lo: float, hi: float, nseg: int = 8, deg: int = 10,
                samples: int = 256) -> SegPoly:
    """Least-squares fit of fn over [lo, hi] as nseg polynomial segments.

    fn: vectorized numpy function of r.  Chebyshev-node sampling per
    segment keeps the fit stable at degree ~10.
    """
    width = (hi - lo) / nseg
    coefs = np.zeros((nseg, deg + 1))
    # error scale: per-segment magnitude, floored at 2% of the global
    # peak.  Segments where the function vanishes (cutoff tails) only
    # need absolute accuracy relative to the function as a whole — and
    # digitized source tables carry noise there that no smooth
    # approximant can (or should) follow.
    global_scale = max(float(np.abs(
        fn(np.linspace(lo, hi, 4097))).max()), 1e-30)
    max_err = 0.0
    for s in range(nseg):
        a = lo + s * width
        # Chebyshev nodes in [0, 1]
        k = np.arange(samples)
        u = 0.5 - 0.5 * np.cos((2 * k + 1) * np.pi / (2 * samples))
        r = a + u * width
        y = fn(r)
        V = np.vander(u, deg + 1, increasing=True)
        c, *_ = np.linalg.lstsq(V, y, rcond=None)
        coefs[s] = c
        # validate on a uniform grid
        uu = np.linspace(0, 1, 257)
        yy = fn(a + uu * width)
        approx = np.polyval(c[::-1], uu)
        scale = max(float(np.abs(yy).max()), 2e-2 * global_scale)
        max_err = max(max_err, float(np.abs(approx - yy).max() / scale))
    return SegPoly(coefs=coefs, lo=float(lo), hi=float(hi),
                   max_rel_err=max_err)
