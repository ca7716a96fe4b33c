"""Geometric regions (host-side, used at setup time).

Covers the region styles used by setup commands (reference: src/region_block.cpp,
region_sphere.cpp, region_prism.cpp).  ``inside`` uses the reference's
inclusive-boundary match semantics (lo <= x <= hi).
"""

from __future__ import annotations

import numpy as np


class Region:
    def inside(self, pts: np.ndarray) -> np.ndarray:  # (N,3) -> (N,) bool
        raise NotImplementedError

    def bounding_box(self) -> tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError


class BlockRegion(Region):
    def __init__(self, lo, hi):
        self.lo = np.asarray(lo, dtype=np.float64)
        self.hi = np.asarray(hi, dtype=np.float64)

    def inside(self, pts):
        return np.all((pts >= self.lo) & (pts <= self.hi), axis=1)

    def bounding_box(self):
        return self.lo.copy(), self.hi.copy()


class SphereRegion(Region):
    def __init__(self, center, radius):
        self.center = np.asarray(center, dtype=np.float64)
        self.radius = float(radius)

    def inside(self, pts):
        d2 = np.sum((pts - self.center) ** 2, axis=1)
        return d2 <= self.radius * self.radius

    def bounding_box(self):
        r = self.radius
        return self.center - r, self.center + r


class PrismRegion(Region):
    """Triclinic box region (src/region_prism.cpp): block + xy/xz/yz tilt."""

    def __init__(self, lo, hi, tilt):
        self.lo = np.asarray(lo, dtype=np.float64)
        self.hi = np.asarray(hi, dtype=np.float64)
        self.tilt = np.asarray(tilt, dtype=np.float64)  # xy, xz, yz

    def _lamda(self, pts):
        ell = self.hi - self.lo
        xy, xz, yz = self.tilt
        d = pts - self.lo
        lz = d[:, 2] / ell[2]
        ly = (d[:, 1] - yz * lz) / ell[1]
        lx = (d[:, 0] - xy * ly - xz * lz) / ell[0]
        return np.stack([lx, ly, lz], axis=1)

    def inside(self, pts):
        lam = self._lamda(np.asarray(pts, dtype=np.float64))
        return np.all((lam >= 0.0) & (lam <= 1.0), axis=1)

    def bounding_box(self):
        return self.lo.copy(), self.hi.copy()
