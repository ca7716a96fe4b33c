"""fix langevin: Langevin thermostat.

Physics per the reference (src/fix_langevin.cpp:286-297 gfactors,
:640-680 post_force): f += gamma1*v + gamma2*(u-0.5) with
gamma1 = -m/(damp*ftm2v), gamma2 = sqrt(m)/ftm2v *
sqrt(24*kB*T_target/(damp*dt*mvv2e)).

Two RNG modes:
- "lammps": bit-exact RanMars draws generated on host per segment and fed
  through the scan (reference-parity trajectories; matches the serial
  reference's per-atom draw order).
- "jax":   on-device threefry (fast, TPU-native, decomposition-invariant
  given the key schedule; not reference-bit-exact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.md.fixes import Fix
from tpumd.utils.ranmars import RanMars


class FixLangevin(Fix):
    name = "langevin"

    def __init__(self, t_start, t_stop, damp, seed, rng="auto"):
        self.t_start = float(t_start)
        self.t_stop = float(t_stop)
        self.damp = float(damp)
        self.seed = int(seed)
        if rng == "auto":
            rng = "lammps" if jax.default_backend() == "cpu" else "jax"
        self.rng = rng
        self._stream = RanMars(self.seed) if rng == "lammps" else None

    def init_state(self, s, ctx):
        if self.rng == "jax":
            return jax.random.PRNGKey(self.seed)
        return ()

    def segment_inputs(self, nsteps, ctx, state):
        if self.rng != "lammps":
            return None
        # draws are generated in the reference's row order (our post-sort
        # setup order) and re-indexed by TAG so the kick reaches the same
        # physical atom regardless of the engine's slot permutation
        n = ctx.natoms or state.x.shape[0]
        draws = self._stream.fill(nsteps * n * 3)
        arr = draws.reshape(nsteps, n, 3).astype(np.dtype(state.x.dtype))
        ref_tags = getattr(self._sim, "_ref_order_tags", None) \
            if hasattr(self, "_sim") else None
        if ref_tags is not None:
            out = np.empty_like(arr)
            out[:, ref_tags - 1, :] = arr
            arr = out
        return jnp.asarray(arr)

    def _t_target(self, ctx):
        # constant-T decks; ramped targets would interpolate on istep
        return self.t_start

    def post_force(self, s, fstate, ctx, xin=None):
        u = ctx.units
        m = ctx.mass_per_atom(s)
        t_target = self._t_target(ctx)
        gamma1 = -m / self.damp / u.ftm2v
        gamma2 = (jnp.sqrt(m) / u.ftm2v
                  * np.sqrt(24.0 * u.boltz / (self.damp * ctx.dt * u.mvv2e))
                  * np.sqrt(t_target))
        if self.rng == "lammps":
            # tag-indexed draws -> this slot's atom (invalid slots read
            # row 0 but are masked out by the group selector)
            rand = xin[jnp.clip(s.tag - 1, 0)] - 0.5
        else:
            key = fstate
            key, sub = jax.random.split(key)
            rand = jax.random.uniform(sub, s.x.shape, s.x.dtype) - 0.5
            fstate = key
        fran = gamma2[:, None] * rand
        fdrag = gamma1[:, None] * s.v
        valid = self.group_sel(s)[:, None]
        f = s.f + jnp.where(valid, fdrag + fran, 0)
        return s.replace(f=f), fstate
