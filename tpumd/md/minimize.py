"""Energy minimization (minimize command).

The reference offers cg/sd/fire/quickmin with linesearch
(src/min_cg.cpp:63-118, src/min_linesearch.cpp, src/min_fire.cpp).
TPU-native implementations:

- FIRE: pure fixed-shape dynamical iteration, one lax.while_loop.
- cg / sd: Polak-Ribiere conjugate gradient (or steepest descent) with a
  backtracking Armijo linesearch — the inner alpha search is itself a
  while_loop of force/energy evaluations, so the whole minimization still
  compiles to one nested while_loop (no host round trips per iteration).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpumd.md.verlet import compute_forces

FIRE_PARAMS = dict(
    delaystep=5, dt_grow=1.1, dt_shrink=0.5, alpha0=0.25, alpha_shrink=0.99,
    tmax=10.0,
)


import functools


@functools.partial(jax.jit,
                   static_argnames=("ctx", "etol", "ftol", "maxiter"))
def _fire_loop(s, neigh, ctx, etol, ftol, maxiter, consts=None):
    """One compiled FIRE while_loop (cached per ctx/tolerances so the
    accelerated-dynamics commands' repeated quenches never recompile)."""
    dt0 = ctx.dt
    p = FIRE_PARAMS

    m = ctx.mass_table[s.type]
    invm = jnp.repeat(1.0 / m, 3)

    def energy_and_force(s, neigh):
        f, energies, _, _, _ = compute_forces(
            s, neigh, ctx, eflag=True, vflag=False, consts=consts)
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
        s2, neigh2, _ = jax.lax.cond(
            do_build, lambda sn: _rebuild(sn[0], sn[1], ctx),
            lambda sn: sn + ((),), (s2, neigh2))
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
    carry = jax.lax.while_loop(cond, body, carry)
    s, neigh, _, _, _, _, it, _, e_final, done = carry
    return s, neigh, it, e0, e_final, done


def minimize(sim, etol: float, ftol: float, maxiter: int, maxeval: int):
    """FIRE minimization; returns (converged, niter, e_initial, e_final)."""
    ctx = sim._ctx
    s, neigh, fstates, istep = sim._carry
    s, neigh, it, e0, e_final, done = _fire_loop(
        s, neigh, ctx, float(etol), float(ftol), int(maxiter),
        consts=sim._consts)
    sim._carry = (s, neigh, fstates, istep)
    sim.state = s
    from tpumd.md.verlet import eval_energies
    f, energies, virial, _ = eval_energies(s, neigh, ctx,
                                            consts=sim._consts)
    sim._last_energies = energies
    sim._last_virial = virial
    return (bool(jax.device_get(done)), int(jax.device_get(it)),
            float(jax.device_get(e0)), float(jax.device_get(e_final)))


def minimize_cg(sim, etol: float, ftol: float, maxiter: int, maxeval: int,
                style: str = "cg"):
    """Conjugate-gradient (Polak-Ribiere) / steepest-descent minimization
    with backtracking linesearch; compiled as one nested while_loop."""
    ctx = sim._ctx
    s, neigh, fstates, istep = sim._carry
    dmax = 0.1  # Min::dmax default — max atom displacement per linesearch

    def energy_and_force(s, neigh):
        f, energies, _, _, _ = compute_forces(
            s, neigh, ctx, eflag=True, vflag=False, consts=sim._consts)
        return f, sum(energies.values())

    def maybe_rebuild(s, neigh):
        from tpumd.md.verlet import _rebuild, decide_rebuild
        neigh = neigh.replace(ago=neigh.ago + 1)
        do = decide_rebuild(s, neigh, ctx)
        return jax.lax.cond(do, lambda sn: _rebuild(sn[0], sn[1], ctx),
                            lambda sn: sn + ((),), (s, neigh))[:2]

    f0, e0 = energy_and_force(s, neigh)
    s = s.replace(f=f0)

    def cond(c):
        s, neigh, h, gsq_prev, it, e_prev, e_cur, done = c
        return (~done) & (it < maxiter)

    def body(c):
        s, neigh, h, gsq_prev, it, e_prev, e_cur, done = c
        f = s.f
        gsq = jnp.sum(f * f)
        if style == "sd":
            h_new = f
        else:
            # Polak-Ribiere beta, reset to steepest descent when
            # the direction turns uphill (MinCG::iterate)
            beta = jnp.maximum(0.0, (gsq - gsq_prev) /
                               jnp.maximum(gsq_prev, 1e-300))
            h_new = f + beta * h
            uphill = jnp.sum(h_new * f) <= 0.0
            h_new = jnp.where(uphill, f, h_new)
        hmax = jnp.max(jnp.abs(h_new))
        alpha0 = jnp.minimum(1.0, dmax / jnp.maximum(hmax, 1e-300))

        # backtracking Armijo linesearch (while_loop of energy evals)
        def ls_cond(lc):
            e_new, tries = lc[3], lc[4]
            # accept on decrease (reference BACKTRACK reduces alpha until
            # the energy drops, min_linesearch.cpp ALPHA_REDUCE)
            return (~(e_new < e_cur + 1e-14 * jnp.abs(e_cur))) & (tries < 20)

        def ls_body(lc):
            alpha, s_t, n_t, e_new, tries = lc
            alpha = alpha * 0.5
            s2 = s.replace(x=s.x + alpha * h_new)
            s2, n2 = maybe_rebuild(s2, neigh)
            f2, e2 = energy_and_force(s2, n2)
            return (alpha, s2.replace(f=f2), n2, e2, tries + 1)

        s1 = s.replace(x=s.x + alpha0 * h_new)
        s1, n1 = maybe_rebuild(s1, neigh)
        f1, e1 = energy_and_force(s1, n1)
        alpha, s_new, n_new, e_new, tries = jax.lax.while_loop(
            ls_cond, ls_body, (alpha0, s1.replace(f=f1), n1, e1,
                               jnp.zeros((), jnp.int32)))
        fail = ~(e_new < e_cur + 1e-14 * jnp.abs(e_cur))

        def sel(a, b):
            return None if a is None else jnp.where(fail, a, b)

        isnone = lambda v: v is None  # noqa: E731
        s_out = jax.tree.map(sel, s.replace(f=f), s_new, is_leaf=isnone)
        n_out = jax.tree.map(sel, neigh, n_new, is_leaf=isnone)
        e_out = jnp.where(fail, e_cur, e_new)
        fsq = jnp.sum(s_out.f ** 2)
        e_ok = (etol > 0) & (jnp.abs(e_out - e_cur) <= etol * 0.5 * (
            jnp.abs(e_out) + jnp.abs(e_cur) + 1e-30))
        f_ok = (ftol > 0) & (fsq <= ftol * ftol)
        done = e_ok | f_ok | fail
        return (s_out, n_out, h_new, gsq, it + 1, e_cur, e_out, done)

    carry = (s, neigh, f0, jnp.asarray(jnp.sum(f0 * f0)),
             jnp.zeros((), jnp.int32), e0 + 1.0, e0, jnp.zeros((), bool))
    carry = jax.jit(lambda c: jax.lax.while_loop(cond, body, c))(carry)
    s, neigh, _, _, it, _, e_final, done = carry
    sim._carry = (s, neigh, fstates, istep)
    sim.state = s
    from tpumd.md.verlet import eval_energies
    f, energies, virial, _ = eval_energies(s, neigh, ctx,
                                           consts=sim._consts)
    sim._last_energies = energies
    sim._last_virial = virial
    return (bool(jax.device_get(done)), int(jax.device_get(it)),
            float(jax.device_get(e0)), float(jax.device_get(e_final)))


def minimize_quickmin(sim, etol: float, ftol: float, maxiter: int,
                      maxeval: int):
    """QuickMin damped dynamics (src/min_quickmin.cpp MinQuickMin::
    iterate): project v onto the force direction globally (zero if
    anti-parallel), Euler step with the per-iteration dt clamped so no
    atom moves beyond dmax."""
    ctx = sim._ctx
    s, neigh, fstates, istep = sim._carry
    dt0 = ctx.dt
    dmax = 0.1
    ftm2v = ctx.units.ftm2v

    m = ctx.mass_table[s.type]
    invm3 = (1.0 / m)[:, None]

    def energy_and_force(s, neigh):
        f, energies, _, _, _ = compute_forces(
            s, neigh, ctx, eflag=True, vflag=False, consts=sim._consts)
        return f, sum(energies.values())

    f0, e0 = energy_and_force(s, neigh)
    s = s.replace(f=f0, v=jnp.zeros_like(s.v))

    def cond(carry):
        s, neigh, it, e_prev, e_cur, done = carry
        return (~done) & (it < maxiter)

    def body(carry):
        s, neigh, it, e_prev, e_cur, done = carry
        v, f = s.v, s.f
        vdotf = jnp.sum(v * f)
        fdotf = jnp.sum(f * f)
        scale = jnp.where(fdotf == 0.0, 0.0,
                          vdotf / jnp.maximum(fdotf, 1e-300))
        v = jnp.where(vdotf < 0.0, jnp.zeros_like(v), scale * f)
        # dt clamp: no atom further than dmax (:163-170)
        vmax = jnp.max(jnp.abs(v))
        dtv = jnp.minimum(dt0, dmax / jnp.maximum(vmax, 1e-300))
        dtf = dtv * ftm2v
        x = s.x + dtv * v
        v = v + (dtf * invm3) * f
        s2 = s.replace(x=x, v=v)
        from tpumd.md.verlet import _rebuild, decide_rebuild
        neigh2 = neigh.replace(ago=neigh.ago + 1)
        do_build = decide_rebuild(s2, neigh2, ctx)
        s2, neigh2, _ = jax.lax.cond(
            do_build, lambda sn: _rebuild(sn[0], sn[1], ctx),
            lambda sn: sn + ((),), (s2, neigh2))
        fnew, e = energy_and_force(s2, neigh2)
        s2 = s2.replace(f=fnew)
        fmax2 = jnp.sum(fnew.reshape(-1) ** 2)
        e_ok = jnp.abs(e - e_cur) <= etol * 0.5 * (
            jnp.abs(e) + jnp.abs(e_cur) + 1e-30)
        f_ok = fmax2 <= ftol * ftol
        done = (etol > 0) & e_ok | ((ftol > 0) & f_ok)
        return (s2, neigh2, it + 1, e_cur, e, done)

    carry = (s, neigh, jnp.zeros((), jnp.int32), e0 + 1.0, e0,
             jnp.zeros((), bool))
    carry = jax.jit(lambda c: jax.lax.while_loop(cond, body, c))(carry)
    s, neigh, it, _, e_final, done = carry
    s = s.replace(v=jnp.zeros_like(s.v))
    sim._carry = (s, neigh, fstates, istep)
    sim.state = s
    from tpumd.md.verlet import eval_energies
    f, energies, virial, _ = eval_energies(s, neigh, ctx,
                                           consts=sim._consts)
    sim._last_energies = energies
    sim._last_virial = virial
    return (bool(jax.device_get(done)), int(jax.device_get(it)),
            float(jax.device_get(e0)), float(jax.device_get(e_final)))


def minimize_hftn(sim, etol: float, ftol: float, maxiter: int,
                  maxeval: int):
    """Hessian-free truncated Newton (src/min_hftn.cpp): outer
    trust-region iteration around an inner CG solve of H p = f, with
    Hessian-vector products from finite differences of forces
    (evaluate_dir_der_, :1312-1590 — forward diffs
    eps = 2 sqrt(1000 eps_mach)/|d|, central for tiny gradients).

    The inner CG is inherently sequential with a force evaluation per
    iteration, so this runs as a host loop over ONE jitted
    evaluate-at-x kernel (move + optional rebuild + forces) — each Hv
    is a single device call, the dots ride along device-side."""
    import numpy as np
    ctx = sim._ctx
    s, neigh, fstates, istep = sim._carry
    dmax = 0.1
    MEPS = 2.220446049250313e-16
    MIN_ETOL_MAG = 1.0e-8

    def _eval(s, neigh, x):
        s2 = s.replace(x=x)
        from tpumd.md.verlet import _rebuild, decide_rebuild
        neigh2 = neigh.replace(ago=neigh.ago + 1)
        do_build = decide_rebuild(s2, neigh2, ctx)
        s2, neigh2, _ = jax.lax.cond(
            do_build, lambda sn: _rebuild(sn[0], sn[1], ctx),
            lambda sn: sn + ((),), (s2, neigh2))
        f, energies, _, _, _ = compute_forces(
            s2, neigh2, ctx, eflag=True, vflag=False, consts=sim._consts)
        return s2.replace(f=f), neigh2, f, sum(energies.values())

    eval_jit = jax.jit(_eval)
    neval = [0]

    def ef(s, neigh, x):
        neval[0] += 1
        return eval_jit(s, neigh, x)

    def g(a):  # host scalar
        return float(jax.device_get(a))

    s, neigh, f, e_cur = ef(s, neigh, s.x)
    e0 = g(e_cur)
    fnorm = np.sqrt(g(jnp.sum(f * f)))
    nunk = 3 * sim.natoms
    tr_max = dmax * np.sqrt(nunk)
    tr = min(1.5 * fnorm, tr_max)
    last_newton = tr_max
    xinf = g(jnp.max(jnp.abs(s.x)))
    e_prev = e0

    def dirder(s, neigh, xk, d, fx, fwd):
        """H d by finite difference of forces; returns (Hd, s, neigh)."""
        dn = np.sqrt(g(jnp.sum(d * d)))
        if dn == 0.0:
            return jnp.zeros_like(d), s, neigh
        if fwd:
            eps = 2.0 * np.sqrt(1000.0 * MEPS) / dn
            s, neigh, f1, _ = ef(s, neigh, xk + eps * d)
            return (fx - f1) / eps, s, neigh
        eps = (3000.0 * MEPS) ** (1.0 / 3.0) / dn
        s, neigh, f1, _ = ef(s, neigh, xk + eps * d)
        s, neigh, f2, _ = ef(s, neigh, xk - eps * d)
        return (f2 - f1) / (2.0 * eps), s, neigh

    converged = False
    it = 0
    for it in range(1, maxiter + 1):
        if fnorm < ftol:
            converged = True
            break
        if neval[0] >= maxeval:
            break
        xk = s.x
        # ---- inner CG (compute_inner_cg_step_, :598-885)
        cg_tol = min(fnorm / 2.0, 0.1 / it)
        cg_tol = max(cg_tol, ftol)
        p = jnp.zeros_like(xk)
        r = f
        d = f
        rr = fnorm * fnorm
        r0norm = fnorm
        pp = 0.0
        nlim = nunk // 5
        if nlim < 100:
            nlim = min(nunk, 100)
        nlim = min(nlim, max((maxeval - neval[0]) // 2, 1))
        if fnorm < np.sqrt(MEPS) * max(1.0, abs(g(e_cur))):
            nlim = min(nlim, max(nunk // 20, 1))
        fwd = fnorm > 1000.0 * np.sqrt(MEPS)
        step_type = "iters"
        for _ in range(nlim):
            hd, s, neigh = dirder(s, neigh, xk, d, f, fwd)
            dhd = g(jnp.sum(d * hd))
            dd = g(jnp.sum(d * d))
            if dhd <= MEPS * dd:
                # negative curvature: step to the TR boundary along d,
                # picking the root with larger CG reduction
                pd = g(jnp.sum(p * d))
                phd = g(jnp.sum(p * hd))
                gd = -g(jnp.sum(f * d))
                disc = max(pd * pd - dd * (pp - tr * tr), 0.0) ** 0.5
                roots = [(-pd + disc) / dd, (-pd - disc) / dd]
                red = [t * (gd + phd) + 0.5 * t * t * dhd for t in roots]
                tau = roots[0] if -red[0] > -red[1] else roots[1]
                p = p + tau * d
                step_type = "negcurv"
                break
            alpha = rr / dhd
            p_old, p = p, p + alpha * d
            ppnew = g(jnp.sum(p * p))
            if np.sqrt(ppnew) > tr:
                # crossed the trust region: back up to the boundary
                pd = g(jnp.sum(p_old * d))
                disc = max(pd * pd - dd * (pp - tr * tr), 0.0) ** 0.5
                p = p_old + ((-pd + disc) / dd) * d
                step_type = "tr"
                break
            if g(jnp.max(jnp.abs(p))) > dmax:
                p = p_old
                step_type = "dmax"
                break
            r = r - alpha * hd
            rrnew = g(jnp.sum(r * r))
            if np.sqrt(rrnew) < cg_tol * r0norm:
                step_type = "newton"
                break
            d = r + (rrnew / rr) * d
            rr = rrnew
            pp = ppnew
        slen2 = np.sqrt(g(jnp.sum(p * p)))
        sleninf = g(jnp.max(jnp.abs(p)))
        # ---- outer: Hp for pred, move, accept/reject (:345-520)
        hp, s, neigh = dirder(s, neigh, xk, p, f, fwd)
        gdotp = -g(jnp.sum(f * p))
        s, neigh, f_new, e_new_a = ef(s, neigh, xk + p)
        e_new = g(e_new_a)
        f2new = np.sqrt(g(jnp.sum(f_new * f_new)))
        ared = g(e_cur) - e_new
        if f2new < ftol:
            f, e_cur, fnorm = f_new, e_new_a, f2new
            converged = True
            break
        if step_type != "dmax":
            mag = max(0.5 * (abs(g(e_cur)) + abs(e_new)), MIN_ETOL_MAG)
            if abs(ared) < etol * mag or sleninf == 0.0:
                f, e_cur, fnorm = f_new, e_new_a, f2new
                converged = True
                break
        php = g(jnp.sum(p * hp))
        pred = -gdotp - 0.5 * php
        accepted = ared > 0.0 and (f2new < fnorm or fnorm > 1.0e-6)
        if accepted:
            e_prev = g(e_cur)
            e_cur = e_new_a
            f = f_new
            fnorm = f2new
            if step_type == "newton":
                last_newton = slen2
            if ared > 0.75 * pred and slen2 >= 0.99 * tr:
                tr = 2.0 * tr
            tr = min(tr, tr_max)
            if step_type == "dmax":
                tr = 0.1 * tr if slen2 <= MEPS else min(tr, 2.0 * slen2)
        else:
            # reject: restore x_k (state already at x_k+p; move back)
            s, neigh, f, e_cur = ef(s, neigh, xk)
            fnorm = np.sqrt(g(jnp.sum(f * f)))
            if step_type == "negcurv" and -ared > pred:
                tr = 0.10 * min(tr, slen2)
            elif step_type == "dmax" and slen2 <= MEPS:
                tr = 0.10 * tr
            elif -ared > pred:
                tr = 0.20 * min(tr, slen2)
            else:
                tr = 0.25 * min(tr, slen2)
            if step_type != "newton" and fnorm < np.sqrt(MEPS):
                tr = min(tr, 2.0 * last_newton)
            last_newton = tr_max
            if tr <= 0.0 or tr <= MEPS * max(1.0, xinf):
                break

    sim._carry = (s, neigh, fstates, istep)
    sim.state = s
    from tpumd.md.verlet import eval_energies
    f, energies, virial, _ = eval_energies(s, neigh, ctx,
                                           consts=sim._consts)
    sim._last_energies = energies
    sim._last_virial = virial
    return converged, it, e0, g(e_cur)
