#!/usr/bin/env python
"""Headline benchmark: 32k-atom LJ melt (the reference's bench/in.lj).

Runs the deck on the available accelerator (f32 on TPU) and prints ONE
JSON line with throughput in Matom-step/s.  Baseline: 1.41 Matom-step/s =
44.212 timesteps/s x 32000 atoms on 1 icc rank
(/root/reference/bench/log.6Oct16.lj.fixed.icc.1).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_MATOM_STEPS = 1.41

IN_LJ = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 20 0 20 0 20
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 1.44 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
neigh_modify    delay 0 every 20 check no
fix             1 all nve
"""


def main():
    from tpumd.script.parser import LammpsScript

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    script = LammpsScript(dtype=dtype)
    script.run_string(IN_LJ)
    sim = script.sim
    sim.verbose = False
    sim.thermo_every = 0  # one compiled segment per run() call

    nsteps = 500 if on_tpu else 100
    sim.run(nsteps)  # warmup: compiles the nsteps-long scan
    e_warm = sim.last_thermo["epair"]
    sanity = abs(e_warm + 5.76) < 0.2  # near the reference melt energy

    t0 = time.perf_counter()
    sim.run(nsteps)  # same segment length -> fully cached
    dt = time.perf_counter() - t0

    steps_per_s = nsteps / dt
    matom = steps_per_s * sim.natoms / 1e6
    print(json.dumps({
        "metric": "lj_melt_32k_matom_steps_per_s",
        "value": round(matom, 4),
        "unit": "Matom-step/s",
        "vs_baseline": round(matom / BASELINE_MATOM_STEPS, 3),
    }))
    if not sanity:
        # a silent physics regression must not ship a headline number
        print(f"ERROR: e_pair sanity check failed: {e_warm}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
