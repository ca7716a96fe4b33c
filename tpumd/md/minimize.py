"""Energy minimization (minimize command).

The reference offers cg/sd/fire/quickmin with linesearch
(src/min_cg.cpp, src/min_fire.cpp).  Here the TPU-native choice is FIRE
(fast inertial relaxation engine): it is a pure fixed-shape dynamical
iteration — no data-dependent linesearch — so the whole minimization
compiles to one lax.while_loop.  ``min_style cg/sd`` map to FIRE with a
note until a linesearch variant lands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpumd.md.verlet import compute_forces

FIRE_PARAMS = dict(
    delaystep=5, dt_grow=1.1, dt_shrink=0.5, alpha0=0.25, alpha_shrink=0.99,
    tmax=10.0,
)


def minimize(sim, etol: float, ftol: float, maxiter: int, maxeval: int):
    """FIRE minimization; returns (converged, niter, e_initial, e_final)."""
    ctx = sim._ctx
    s, neigh, fstates, istep = sim._carry
    dt0 = ctx.dt
    p = FIRE_PARAMS

    m = ctx.mass_table[s.type]
    invm = jnp.repeat(1.0 / m, 3)

    def energy_and_force(s, neigh):
        f, energies, _, _, _ = compute_forces(
            s, neigh, ctx, eflag=True, vflag=False, consts=sim._consts)
        e = sum(energies.values())
        return f, e

    f0, e0 = energy_and_force(s, neigh)
    s = s.replace(f=f0, v=jnp.zeros_like(s.v))

    def cond(carry):
        s, neigh, vflat, dt, alpha, nneg, it, e_prev, e_cur, done = carry
        return (~done) & (it < maxiter)

    def body(carry):
        s, neigh, vflat, dt, alpha, nneg, it, e_prev, e_cur, done = carry
        fflat = s.f.reshape(-1)
        # velocity Verlet step with FIRE velocity mixing
        vflat = vflat + dt * fflat * invm
        vdotf = jnp.sum(vflat * fflat)
        fnorm = jnp.sqrt(jnp.sum(fflat * fflat))
        vnorm = jnp.sqrt(jnp.sum(vflat * vflat))
        mix = (1.0 - alpha) * vflat + alpha * fflat * (
            vnorm / jnp.maximum(fnorm, 1e-30))
        uphill = vdotf <= 0.0
        vflat = jnp.where(uphill, jnp.zeros_like(vflat), mix)
        grow = (~uphill) & (nneg > p["delaystep"])
        dt = jnp.where(grow, jnp.minimum(dt * p["dt_grow"],
                                         p["tmax"] * dt0), dt)
        alpha = jnp.where(grow, alpha * p["alpha_shrink"], alpha)
        dt = jnp.where(uphill, dt * p["dt_shrink"], dt)
        alpha = jnp.where(uphill, jnp.asarray(p["alpha0"], dt.dtype), alpha)
        nneg = jnp.where(uphill, 0, nneg + 1)

        x = s.x + (dt * vflat).reshape(s.x.shape)
        s2 = s.replace(x=x)
        from tpumd.md.verlet import _rebuild, decide_rebuild
        neigh2 = neigh.replace(ago=neigh.ago + 1)
        do_build = decide_rebuild(s2, neigh2, ctx)
        s2, neigh2 = jax.lax.cond(
            do_build, lambda sn: _rebuild(sn[0], sn[1], ctx),
            lambda sn: sn, (s2, neigh2))
        f, e = energy_and_force(s2, neigh2)
        s2 = s2.replace(f=f)
        fmax2 = jnp.sum(f.reshape(-1) ** 2)
        e_ok = jnp.abs(e - e_cur) <= etol * 0.5 * (
            jnp.abs(e) + jnp.abs(e_cur) + 1e-30)
        f_ok = fmax2 <= ftol * ftol
        done = (etol > 0) & e_ok | ((ftol > 0) & f_ok)
        return (s2, neigh2, vflat, dt, alpha, nneg, it + 1, e_cur, e, done)

    dt_a = jnp.asarray(dt0, s.x.dtype)
    alpha_a = jnp.asarray(p["alpha0"], s.x.dtype)
    carry = (s, neigh, jnp.zeros_like(s.v.reshape(-1)), dt_a, alpha_a,
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
             e0 + 1.0, e0, jnp.zeros((), bool))
    carry = jax.jit(
        lambda c: jax.lax.while_loop(cond, body, c))(carry)
    s, neigh, _, _, _, _, it, _, e_final, done = carry
    sim._carry = (s, neigh, fstates, istep)
    sim.state = s
    from tpumd.md.verlet import eval_energies
    f, energies, virial, _ = eval_energies(s, neigh, ctx,
                                            consts=sim._consts)
    sim._last_energies = energies
    sim._last_virial = virial
    return (bool(jax.device_get(done)), int(jax.device_get(it)),
            float(jax.device_get(e0)), float(jax.device_get(e_final)))
