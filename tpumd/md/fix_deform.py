"""fix deform: prescribed box deformation (src/fix_deform.cpp).

Supported per-dim styles: final lo hi, scale s, vel V, erate R, delta
dlo dhi; remap x (default) rescales atom lamda coordinates with the box
each step (SLLOD/remap v and tilt styles TBD).  The box is updated in
end_of_step from the run's begin/end fraction, exactly like the
reference's linear interpolation set[i].lo_target computation.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from tpumd.md.fixes import Fix


@struct.dataclass
class DeformState:
    lo0: jnp.ndarray    # (3,) box at run start
    hi0: jnp.ndarray
    step: jnp.ndarray
    begin: jnp.ndarray
    end: jnp.ndarray


class FixDeform(Fix):
    name = "deform"
    needs_step = True
    box_change = True
    eos_box_change = True

    def __init__(self, nevery, specs, remap="x"):
        # specs: dim -> (style, args...)
        self.nevery = max(int(nevery), 1)
        self.specs = specs
        self.remap = remap

    def init_state(self, s, ctx):
        return DeformState(
            lo0=s.box.lo, hi0=s.box.hi,
            step=jnp.zeros((), jnp.int32),
            begin=jnp.zeros((), jnp.int32), end=jnp.zeros((), jnp.int32))

    def set_step(self, fstate, istep):
        return fstate.replace(step=istep)

    def pre_run(self, fstate, begin, end):
        return fstate.replace(begin=jnp.asarray(begin, jnp.int32),
                              end=jnp.asarray(end, jnp.int32))

    def _targets(self, fst, ctx, dtype):
        """(lo_target, hi_target) at the current step."""
        num = (fst.step - fst.begin).astype(dtype)
        den = jnp.maximum((fst.end - fst.begin).astype(dtype), 1.0)
        delta = jnp.clip(num / den, 0.0, 1.0)
        t_elapsed = num * ctx.dt
        lo_t, hi_t = [], []
        for d in range(3):
            lo0 = fst.lo0[d]
            hi0 = fst.hi0[d]
            spec = self.specs.get(d)
            if spec is None:
                lo_t.append(lo0)
                hi_t.append(hi0)
                continue
            style = spec[0]
            if style == "final":
                flo, fhi = spec[1], spec[2]
                lo_t.append(lo0 + delta * (flo - lo0))
                hi_t.append(hi0 + delta * (fhi - hi0))
            elif style == "delta":
                lo_t.append(lo0 + delta * spec[1])
                hi_t.append(hi0 + delta * spec[2])
            elif style == "scale":
                center = 0.5 * (lo0 + hi0)
                half = 0.5 * (hi0 - lo0) * (1.0 + delta * (spec[1] - 1.0))
                lo_t.append(center - half)
                hi_t.append(center + half)
            elif style == "vel":
                half = 0.5 * (hi0 - lo0) + 0.5 * spec[1] * t_elapsed
                center = 0.5 * (lo0 + hi0)
                lo_t.append(center - half)
                hi_t.append(center + half)
            elif style == "erate":
                half = 0.5 * (hi0 - lo0) * (1.0 + spec[1] * t_elapsed)
                center = 0.5 * (lo0 + hi0)
                lo_t.append(center - half)
                hi_t.append(center + half)
            else:
                raise ValueError(f"deform style {style} not supported")
        return jnp.stack(lo_t), jnp.stack(hi_t)

    def current_rates(self, sim, fstate):
        """(h_rate diag (3,), h_ratelo (3,), tilt-rate dict) for
        compute temp/deform's streaming-velocity bias (the reference's
        Domain::h_rate/h_ratelo, set by FixDeform::init from the linear
        targets over the run window)."""
        import jax as _jax
        import numpy as _np
        fst = fstate
        begin = int(_jax.device_get(fst.begin))
        end = int(_jax.device_get(fst.end))
        lo0 = _np.asarray(_jax.device_get(fst.lo0), _np.float64)
        hi0 = _np.asarray(_jax.device_get(fst.hi0), _np.float64)
        t_total = max(end - begin, 1) * sim._ctx.dt
        h_rate = _np.zeros(3)
        h_ratelo = _np.zeros(3)
        for d in range(3):
            spec = self.specs.get(d)
            if spec is None:
                continue
            style = spec[0]
            if style == "final":
                lo_f, hi_f = spec[1], spec[2]
            elif style == "delta":
                lo_f, hi_f = lo0[d] + spec[1], hi0[d] + spec[2]
            elif style == "scale":
                c = 0.5 * (lo0[d] + hi0[d])
                h = 0.5 * (hi0[d] - lo0[d]) * spec[1]
                lo_f, hi_f = c - h, c + h
            elif style == "vel":
                c = 0.5 * (lo0[d] + hi0[d])
                h = 0.5 * (hi0[d] - lo0[d]) + 0.5 * spec[1] * t_total
                lo_f, hi_f = c - h, c + h
            elif style == "erate":
                c = 0.5 * (lo0[d] + hi0[d])
                h = 0.5 * (hi0[d] - lo0[d]) * (1.0 + spec[1] * t_total)
                lo_f, hi_f = c - h, c + h
            else:
                continue
            h_rate[d] = ((hi_f - lo_f) - (hi0[d] - lo0[d])) / t_total
            h_ratelo[d] = (lo_f - lo0[d]) / t_total
        tilt = {k: v for k, v in getattr(self, "tilt_rates", {}).items()}
        return h_rate, h_ratelo, tilt

    def end_of_step(self, s, fst, ctx):
        apply = (fst.step % self.nevery) == 0
        lo_t, hi_t = self._targets(fst, ctx, s.x.dtype)
        box = s.box
        lo = jnp.where(apply, lo_t, box.lo)
        hi = jnp.where(apply, hi_t, box.hi)
        if self.remap == "x":
            lam = (s.x - box.lo) / box.lengths
            x = lo + lam * (hi - lo)
        else:
            x = s.x
        return s.replace(x=x, box=box.replace(lo=lo, hi=hi)), fst
