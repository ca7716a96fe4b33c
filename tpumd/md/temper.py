"""Parallel tempering (temper command) — the multi-replica / Universe
analog (src/REPLICA/temper.cpp, src/universe.h:23-42).

R replicas run the same deck at different thermostat targets.  Every
``nevery`` steps adjacent-temperature replicas attempt a Metropolis swap:
boltz_factor = (pe_hi - pe_lo) * (1/(kB T_hi) - 1/(kB T_lo)); accepted
swaps EXCHANGE THE CONFIGURATIONS (x, v scaled by sqrt(T_new/T_old)) —
physically equivalent to the reference's thermostat-target swap, but it
keeps every replica's compiled step context static (no recompiles).

On this single-chip build replicas run sequentially; under a device mesh
they map onto an extra "replica" axis (each replica's arrays placed on
its own mesh slice) — swaps stay host-side Metropolis decisions either
way.
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


def temper(sims, temps, nsteps: int, nevery: int, seed_swap: int,
           seed_boltz: int, boltz: float, log=print):
    """Run parallel tempering; returns per-window swap acceptance list."""
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
        nacc = natt = 0
        for lo in range(which, r - 1, 2):
            hi = lo + 1
            natt += 1
            bf = (pes[lo] - pes[hi]) * (1.0 / (boltz * temps[lo])
                                        - 1.0 / (boltz * temps[hi]))
            if bf >= 0.0 or ranboltz.uniform() < np.exp(bf):
                swap_configurations(sims[lo], sims[hi], temps[lo], temps[hi])
                nacc += 1
        accepts.append((nacc, natt))
        log(f"temper window {w}: {nacc}/{natt} swaps accepted, "
            f"pe = {[round(p, 3) for p in pes]}")
    return accepts
