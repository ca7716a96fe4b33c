"""Wall fixes: lj93, lj126, harmonic (post_force) and reflect
(post_integrate).  References: src/fix_wall.cpp (wall spec parsing,
EDGE coords), fix_wall_lj93.cpp, fix_wall_lj126.cpp,
fix_wall_harmonic.cpp, fix_wall_reflect.cpp.

Each wall is (dim, side, coord): side -1 = lo wall (atoms above it),
side +1 = hi wall.  fwall pushes atoms away; f[dim] -= side-signed fwall
per the reference convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpumd.md.fixes import Fix

_FACES = {"xlo": (0, -1), "xhi": (0, 1), "ylo": (1, -1), "yhi": (1, 1),
          "zlo": (2, -1), "zhi": (2, 1)}


class _FixWall(Fix):
    thermo_scalar = True

    def __init__(self, walls):
        # walls: list of (face, coord_or_EDGE, eps, sigma, cutoff)
        self.walls = walls

    def _coord(self, s, face, spec):
        dim, side = _FACES[face]
        if spec == "EDGE":
            return s.box.lo[dim] if side < 0 else s.box.hi[dim]
        return jnp.asarray(float(spec), s.x.dtype)

    def wall_fe(self, delta, eps, sigma, cutoff):
        """(fwall_magnitude, energy) for distance delta in (0, cutoff)."""
        raise NotImplementedError

    def post_force(self, s, fstate, ctx, xin=None):
        f = s.f
        sel = self.group_sel(s)
        for face, spec, eps, sigma, cutoff in self.walls:
            dim, side = _FACES[face]
            coord = self._coord(s, face, spec)
            delta = jnp.where(side < 0, s.x[:, dim] - coord,
                              coord - s.x[:, dim])
            act = sel & (delta < cutoff) & (delta > 0)
            dsafe = jnp.where(act, delta, jnp.ones_like(delta))
            fw, _ = self.wall_fe(dsafe, eps, sigma, cutoff)
            fw = jnp.where(act, side * fw, 0.0)
            f = f.at[:, dim].add(-fw)
        return s.replace(f=f), fstate

    def energy(self, s, ctx):
        """Total wall energy (fix_modify energy / f_ID output)."""
        e = jnp.zeros((), s.x.dtype)
        sel = self.group_sel(s)
        for face, spec, eps, sigma, cutoff in self.walls:
            dim, side = _FACES[face]
            coord = self._coord(s, face, spec)
            delta = jnp.where(side < 0, s.x[:, dim] - coord,
                              coord - s.x[:, dim])
            act = sel & (delta < cutoff) & (delta > 0)
            dsafe = jnp.where(act, delta, jnp.ones_like(delta))
            _, ew = self.wall_fe(dsafe, eps, sigma, cutoff)
            e = e + jnp.sum(jnp.where(act, ew, 0.0))
        return e

    def output(self, sim):
        import jax
        return float(jax.device_get(self.energy(sim._carry[0], sim._ctx)))


class FixWallLJ93(_FixWall):
    """E = eps(2/15 (s/r)^9 - (s/r)^3) - offset (fix_wall_lj93.cpp)."""

    name = "wall/lj93"

    def wall_fe(self, delta, eps, sigma, cutoff):
        c1 = 6.0 / 5.0 * eps * sigma**9
        c2 = 3.0 * eps * sigma**3
        c3 = 2.0 / 15.0 * eps * sigma**9
        c4 = eps * sigma**3
        ci = 1.0 / cutoff
        offset = c3 * ci**9 - c4 * ci**3
        rinv = 1.0 / delta
        r2 = rinv * rinv
        r4 = r2 * r2
        fw = c1 * r4 * r4 * r2 - c2 * r4
        ew = c3 * r4 * r4 * rinv - c4 * r2 * rinv - offset
        return fw, ew


class FixWallLJ126(_FixWall):
    """Full 12-6 LJ wall (fix_wall_lj126.cpp)."""

    name = "wall/lj126"

    def wall_fe(self, delta, eps, sigma, cutoff):
        c1 = 48.0 * eps * sigma**12
        c2 = 24.0 * eps * sigma**6
        c3 = 4.0 * eps * sigma**12
        c4 = 4.0 * eps * sigma**6
        ci = 1.0 / cutoff
        offset = c3 * ci**12 - c4 * ci**6
        rinv = 1.0 / delta
        r2 = rinv * rinv
        r6 = r2 * r2 * r2
        fw = (c1 * r6 * r6 - c2 * r6) * rinv
        ew = c3 * r6 * r6 - c4 * r6 - offset
        return fw, ew


class FixWallHarmonic(_FixWall):
    """E = eps (cutoff - r)^2 inside the cutoff (fix_wall_harmonic.cpp)."""

    name = "wall/harmonic"

    def wall_fe(self, delta, eps, sigma, cutoff):
        dr = cutoff - delta
        return 2.0 * eps * dr, eps * dr * dr


class FixWallReflect(Fix):
    """Bounce atoms off the wall (fix_wall_reflect.cpp post_integrate):
    x -> 2*coord - x, v[dim] -> -v[dim] when past the wall."""

    name = "wall/reflect"

    def __init__(self, walls):
        self.walls = walls  # list of (face, coord_or_EDGE)

    def post_integrate(self, s, fstate, ctx):
        x, v = s.x, s.v
        sel = self.group_sel(s)
        for face, spec in self.walls:
            dim, side = _FACES[face]
            coord = (s.box.lo[dim] if side < 0 else s.box.hi[dim]) \
                if spec == "EDGE" else jnp.asarray(float(spec), s.x.dtype)
            past = sel & (jnp.where(side < 0, x[:, dim] < coord,
                                    x[:, dim] > coord))
            x = x.at[:, dim].set(jnp.where(past, 2 * coord - x[:, dim],
                                           x[:, dim]))
            v = v.at[:, dim].set(jnp.where(past, -v[:, dim], v[:, dim]))
        return s.replace(x=x, v=v), fstate
