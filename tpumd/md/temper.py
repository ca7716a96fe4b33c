"""Parallel tempering (temper command) — the multi-replica / Universe
analog (src/REPLICA/temper.cpp, src/universe.h:23-42).

R replicas run the same deck at different thermostat targets.  Every
``nevery`` steps adjacent-temperature replicas attempt a Metropolis swap:
boltz_factor = (pe_hi - pe_lo) * (1/(kB T_hi) - 1/(kB T_lo)); accepted
swaps EXCHANGE THE CONFIGURATIONS (x, v scaled by sqrt(T_new/T_old)) —
physically equivalent to the reference's thermostat-target swap, but it
keeps every replica's compiled step context static (no recompiles).

Execution is CONCURRENT by default: the replica carries are stacked on a
leading lane axis and one jitted ``vmap`` of the dynamic-length segment
advances all replicas per window (the per-lane thermostat target rides
the NHState ts_start/ts_stop leaves).  With more than one device the
lane axis is placed on a "replica" mesh axis so XLA runs replicas on
separate chips — the TPU translation of the reference's one-world-per-
partition MPI layout.  Swaps stay host-side Metropolis decisions: they
permute the lane axis of (state, neigh) and rescale velocities.
Decks whose fixes feed per-step host streams (bit-exact RanMars
langevin) fall back to the sequential per-sim loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.utils.ranpark import RanPark


def scale_velocities(sim, factor):
    s, neigh, fstates, istep = sim._carry[:4]
    s = s.replace(v=s.v * factor)
    sim._carry = (s, neigh, fstates, istep) + tuple(sim._carry[4:])
    sim.state = s


def swap_configurations(sim_a, sim_b, t_a, t_b):
    """Exchange atomic configurations and rescale velocities."""
    sa = sim_a._carry
    sb = sim_b._carry
    fac_ab = np.sqrt(t_a / t_b)  # config moving from b -> a heats to t_a
    a_new = (sb[0].replace(v=sb[0].v * fac_ab), sb[1]) + sa[2:]
    b_new = (sa[0].replace(v=sa[0].v / fac_ab), sa[1]) + sb[2:]
    sim_a._carry, sim_b._carry = a_new, b_new
    sim_a.state, sim_b.state = a_new[0], b_new[0]


def _can_batch(sims) -> bool:
    """Batched lanes need a pure-device step: no per-step host streams
    (fix langevin RanMars), no rRESPA (separate step factory is fine but
    keep the first cut narrow), no external callbacks."""
    from tpumd.md.fixes import Fix
    sim = sims[0]
    if sim._ctx is None or sim._ctx.respa is not None:
        return False
    for fx in sim.fixes:
        if getattr(fx, "host_every", 0):
            return False
        # a fix that OVERRIDES segment_inputs feeds per-step host
        # streams; calling it to probe would CONSUME RanMars state, so
        # detect by override instead
        if type(fx).segment_inputs is not Fix.segment_inputs:
            return False
        if getattr(fx, "mode", "") == "pf/callback":
            return False
    return True


def _metropolis(pes, temps, ranboltz, boltz, which_parity, do_swap):
    """Shared Metropolis sweep: draws match the sequential path exactly
    (boltz draw only when bf < 0 — short-circuit order preserved)."""
    r = len(pes)
    nacc = natt = 0
    for lo in range(which_parity, r - 1, 2):
        hi = lo + 1
        natt += 1
        bf = (pes[lo] - pes[hi]) * (1.0 / (boltz * temps[lo])
                                    - 1.0 / (boltz * temps[hi]))
        if bf >= 0.0 or ranboltz.uniform() < np.exp(bf):
            do_swap(lo, hi)
            nacc += 1
    return nacc, natt


def temper(sims, temps, nsteps: int, nevery: int, seed_swap: int,
           seed_boltz: int, boltz: float, log=print):
    """Run parallel tempering; returns per-window swap acceptance list."""
    for sim in sims:
        if sim._ctx is None:
            sim.setup()
    if _can_batch(sims):
        try:
            return _temper_batched(sims, temps, nsteps, nevery, seed_swap,
                                   seed_boltz, boltz, log)
        except _BatchOverflow:
            log("temper: neighbor overflow in batched lanes — "
                "falling back to sequential replicas")
    return _temper_sequential(sims, temps, nsteps, nevery, seed_swap,
                              seed_boltz, boltz, log)


def _temper_sequential(sims, temps, nsteps, nevery, seed_swap, seed_boltz,
                       boltz, log):
    r = len(sims)
    ranswap = RanPark(seed_swap)
    ranboltz = RanPark(seed_boltz)
    accepts = []
    nwindows = nsteps // nevery
    for w in range(1, nwindows + 1):
        for sim in sims:
            sim.run(nevery)
        pes = [sim.last_thermo["pe"] * (sim.natoms if sim.thermo_norm else 1)
               for sim in sims]
        which = int(ranswap.uniform() < 0.5)
        nacc, natt = _metropolis(
            pes, temps, ranboltz, boltz, which,
            lambda lo, hi: swap_configurations(
                sims[lo], sims[hi], temps[lo], temps[hi]))
        accepts.append((nacc, natt))
        log(f"temper window {w}: {nacc}/{natt} swaps accepted, "
            f"pe = {[round(p, 3) for p in pes]}")
    return accepts


class _BatchOverflow(Exception):
    pass


def _replica_sharding(r):
    """A NamedSharding over a 'replica' mesh axis when the device count
    divides the replica count; None on one device (plain vmap)."""
    devs = jax.devices()
    if len(devs) <= 1:
        return None
    nd = len(devs)
    while nd > 1 and r % nd != 0:
        nd -= 1
    if nd <= 1:
        return None
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(devs[:nd]), ("replica",))
    return NamedSharding(mesh, P("replica"))


def _temper_batched(sims, temps, nsteps, nevery, seed_swap, seed_boltz,
                    boltz, log):
    from tpumd.md.verlet import run_segment_dyn, eval_energies

    sim0 = sims[0]
    ctx = sim0._ctx
    consts = sim0._consts
    fixes = sim0.fixes
    r = len(sims)

    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[sim._carry for sim in sims])
    shard = _replica_sharding(r)
    if shard is not None:
        stacked = jax.device_put(stacked, shard)

    def _window(carry, begin, end):
        s, neigh, fstates, istep = carry[:4]
        fstates = list(fstates)
        for i, fx in enumerate(fixes):
            if hasattr(fx, "pre_run"):
                fstates[i] = fx.pre_run(fstates[i], begin, end)
        carry = (s, neigh, tuple(fstates), istep) + tuple(carry[4:])
        carry = run_segment_dyn(carry, ctx, jnp.int32(nevery),
                                consts=consts)
        _, energies, _, _ = eval_energies(carry[0], carry[1], ctx,
                                          consts=consts)
        pe = sum(energies.values())
        return carry, pe

    window = jax.jit(jax.vmap(_window, in_axes=(0, None, None)))

    @jax.jit
    def _swap_lanes(carry, perm, vmul, vdiv):
        # v * fac for the lane heating up, v / fac for the one cooling —
        # the SAME ops as swap_configurations so both paths are bitwise
        # identical (x*sqrt(a/b) != x/sqrt(b/a) in IEEE)
        s, neigh = carry[0], carry[1]
        s = jax.tree_util.tree_map(lambda a: a[perm], s)
        neigh = jax.tree_util.tree_map(lambda a: a[perm], neigh)
        s = s.replace(v=s.v * vmul[:, None, None] / vdiv[:, None, None])
        return (s, neigh) + tuple(carry[2:])

    ranswap = RanPark(seed_swap)
    ranboltz = RanPark(seed_boltz)
    accepts = []
    nwindows = nsteps // nevery
    step0 = sim0.step
    for w in range(1, nwindows + 1):
        begin = step0 + (w - 1) * nevery
        stacked, pe_lanes = window(stacked, begin, begin + nevery)
        if bool(jax.device_get(jnp.any(stacked[1].overflow))):
            # hand the un-advanced snapshots back for sequential regrow
            raise _BatchOverflow
        pes = [float(p) for p in jax.device_get(pe_lanes)]
        which = int(ranswap.uniform() < 0.5)
        perm = list(range(r))
        vmul = [1.0] * r
        vdiv = [1.0] * r

        def do_swap(lo, hi):
            perm[lo], perm[hi] = perm[hi], perm[lo]
            # lane lo receives hi's config: heat by *sqrt(T_lo/T_hi);
            # lane hi receives lo's: cool by /sqrt(T_lo/T_hi)
            fac = float(np.sqrt(temps[lo] / temps[hi]))
            vmul[lo] = fac
            vdiv[hi] = fac

        nacc, natt = _metropolis(pes, temps, ranboltz, boltz, which,
                                 do_swap)
        if nacc:
            dt_ = stacked[0].v.dtype
            stacked = _swap_lanes(stacked, jnp.asarray(perm, jnp.int32),
                                  jnp.asarray(vmul, dt_),
                                  jnp.asarray(vdiv, dt_))
        accepts.append((nacc, natt))
        log(f"temper window {w}: {nacc}/{natt} swaps accepted, "
            f"pe = {[round(p, 3) for p in pes]}")

    # unstack back into the per-sim hosts
    target = step0 + nwindows * nevery
    for i, sim in enumerate(sims):
        sim._carry = jax.tree_util.tree_map(lambda a: a[i], stacked)
        sim.state = sim._carry[0]
        sim._natoms = None
        sim.step = target
        sim.recompute_output()   # refresh forces/energies/virial
        sim.run(0)               # thermo line + last_thermo at the end
    return accepts
