#!/usr/bin/env python
"""Run every reference benchmark deck on the available accelerator and
print a per-deck throughput table (Matom-step/s) vs the shipped 1-rank
baselines (/root/reference/bench/log.6Oct16.*.fixed.icc.1).

Usage: python tools/bench_all.py [lj eam chain chute] [--steps N]
Writes results to BENCH_TABLE.json in the repo root.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
BENCH = "/root/reference/bench"

# 1-rank icc baselines in Matom-step/s (timesteps/s x 32000 / 1e6)
BASELINES = {"lj": 1.41, "chain": 3.27, "eam": 0.536, "chute": 6.0,
             "rhodo": 0.091, "rhodo_class": 0.091}

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

# energy sanity targets: (key, value, abs tolerance) near the reference's
# step-100 thermo values — a silent physics regression must not ship a
# perf number
SANITY = {
    "lj": ("epair", -5.76, 0.2),
    "chain": ("etotal", 22.4, 0.3),
    "eam": ("epair", -109900.0, 900.0),  # equilibrated melt (ref -109957)
    "chute": ("ke", 784200.0, 2000.0),
    # the synthetic water lattice relaxes and heats to ~560-590 K —
    # verified IDENTICAL in the reference binary on this deck
    "rhodo_class": ("temp", 560.0, 130.0),
}

# rhodo stand-in: the reference snapshot ships in.rhodo but NO data.rhodo,
# so the full rhodo STACK (CHARMM real-space + PPPM + SHAKE + NPT) is
# benchmarked on a replicated 24,000-atom water box instead
RHODO_CLASS = """
units           real
atom_style      full
bond_style      harmonic
angle_style     charmm
pair_style      lj/charmm/coul/long 6.0 7.0
kspace_style    pppm 1e-4
special_bonds   charmm
read_data       {golden}/data.water
replicate       4 4 4
bond_coeff      1 450.0 0.9572
angle_coeff     1 55.0 104.52 0.0 0.0
pair_coeff      1 1 0.1521 3.1507
pair_coeff      2 2 0.0460 0.4000
neighbor        2.0 bin
neigh_modify    every 1 delay 5 check yes
fix             0 all shake 0.0001 20 0 b 1 a 1
fix             1 all npt temp 300.0 300.0 100.0 iso 0.0 0.0 1000.0
velocity        all create 300.0 48291 loop geom
timestep        1.0
"""


def build(deck_name):
    from tpumd.script.parser import LammpsScript
    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    script = LammpsScript(dtype=dtype, data_dir=BENCH)
    if deck_name == "lj":
        script.run_string(IN_LJ)
    elif deck_name == "rhodo_class":
        golden = os.path.join(REPO, "tests", "golden", "water_npt")
        script.run_string(RHODO_CLASS.format(golden=golden))
    else:
        deck = open(f"{BENCH}/in.{deck_name}").read()
        # strip the run so we control segmenting
        deck = "\n".join(ln for ln in deck.splitlines()
                         if not ln.strip().startswith(("run ", "run\t")))
        script.run_string(deck)
    script._finalize_atoms()
    sim = script.sim
    sim.verbose = False
    sim.thermo_every = 0
    return sim


def bench_deck(name, nsteps):
    t_build = time.perf_counter()
    sim = build(name)
    t0 = time.perf_counter()
    sim.run(nsteps)              # compile + warmup
    compile_s = time.perf_counter() - t0
    key, target, tol = SANITY[name]
    val = sim.last_thermo[key]
    ok = abs(val - target) < tol
    t0 = time.perf_counter()
    sim.run(nsteps)              # timed (same segment length -> cached)
    dt = time.perf_counter() - t0
    sps = nsteps / dt
    matom = sps * sim.natoms / 1e6
    mode = "cellgrid" if sim._ctx.is_cellgrid else "matrix"
    return {
        "deck": name, "natoms": sim.natoms, "steps": nsteps,
        "timesteps_per_s": round(sps, 3),
        "matom_steps_per_s": round(matom, 4),
        "baseline": BASELINES[name],
        "vs_baseline": round(matom / BASELINES[name], 2),
        "engine": mode, "compile_s": round(compile_s, 1),
        "sanity_ok": bool(ok), "sanity_value": float(val),
        "backend": jax.default_backend(),
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    decks = args or ["lj", "chain", "eam", "chute"]
    nsteps = 500 if jax.default_backend() != "cpu" else 100
    for a in sys.argv[1:]:
        if a.startswith("--steps"):
            nsteps = int(a.split("=")[1])
    results = []
    for name in decks:
        try:
            # rhodo_class: NPT compresses the synthetic water lattice ~15%
            # linear; past ~300 steps the shrink crosses the cell-grid's
            # 5% box margin and the segment recompiles (150 s) inside the
            # timed window.  100 steps is the reference bench protocol
            # (bench/README:22-24) — use it for this deck.
            r = bench_deck(name, min(nsteps, 100)
                           if name == "rhodo_class" else nsteps)
        except Exception as e:  # noqa: BLE001
            r = {"deck": name, "error": f"{type(e).__name__}: {e}"}
        results.append(r)
        print(json.dumps(r), flush=True)
    out = os.path.join(REPO, "BENCH_TABLE.json")
    # merge into the existing table so partial re-runs keep other decks
    table = []
    if os.path.exists(out):
        with open(out) as fh:
            table = json.load(fh)
    merged = {r["deck"]: r for r in table}
    merged.update({r["deck"]: r for r in results})
    with open(out, "w") as fh:
        json.dump(list(merged.values()), fh, indent=1)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
