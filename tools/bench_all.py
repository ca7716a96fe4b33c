#!/usr/bin/env python
"""Run every reference benchmark deck on the available accelerator and
print a per-deck throughput table (Matom-step/s) vs the shipped 1-rank
baselines (/root/reference/bench/log.6Oct16.*.fixed.icc.1).

Usage: python tools/bench_all.py [lj eam chain chute rhodo_class lj864]
                                 [--steps=N]
Writes results to BENCH_TABLE.json in the repo root.

Sanity protocol: each deck runs 100 steps first and its thermo row is
compared against the reference binary's step-100 row at tight relative
tolerances (a silent physics regression must not ship a perf number);
the timed window is a separate 500-step segment.  Targets below are
from the shipped logs (bench/log.6Oct16.*) or regenerated with the
locally built reference binary (/tmp/lmpbuild/lmp) for the decks the
snapshot does not cover (rhodo_class stand-in, 864k lj) — regenerate
via tools/gen_bench_targets.sh.
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

# 1-rank icc baselines in Matom-step/s (timesteps/s x natoms / 1e6)
BASELINES = {"lj": 1.41, "chain": 3.27, "eam": 0.536, "chute": 6.0,
             "rhodo": 0.091, "rhodo_class": 0.091, "lj864": 1.41}

IN_LJ = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 {n} 0 {n} 0 {n}
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

# step-100 thermo targets: {key: (reference value, relative tolerance
# [, scale])}.  |value - target| must be < rtol * max(|target|, scale);
# the scale override keeps near-zero crossings (rhodo_class TotEng)
# meaningful.  Tolerances reflect what f32 can hold at step 100:
# deterministic NVE decks are tight; chain's langevin uses on-device
# threefry instead of the reference's serial RanMars, so its row is an
# ensemble match (temp fluctuates O(1/sqrt(N))); rhodo_class's violent
# first-100-step heating amplifies f32 divergence.
# step-0 thermo targets (deterministic lattice + loop-geom velocities:
# bit-reproducible initial state, so these hold to f32 resolution even
# on chaotic decks).  |value - target| must be < 1e-4 * max(|target|,
# scale).  A physics regression of the r3 cell-margin class (15% step-0
# E_pair error) fails here no matter what the trajectory later does.
# Sources: step-0 rows of bench/log.6Oct16.*.fixed.icc.1; lj864 shares
# lj's per-atom lattice energy exactly (same reduced density + cutoff),
# with KE/atom scaled by (1-1/N) dof; rhodo_class regenerated with the
# locally built reference binary (tools/gen_bench_targets.sh).
STEP0_RTOL = 1e-4
STEP0 = {
    "lj": {"temp": 1.44, "epair": -6.7733681, "etotal": -4.6134356},
    "lj864": {"temp": 1.44, "epair": -6.7733681, "etotal": -4.6133706},
    "chain": {"temp": 0.97029772, "epair": 0.44484087,
              "emol": 20.494523, "etotal": 22.394765},
    "eam": {"temp": 1600.0, "epair": -113280.0, "etotal": -106662.09},
    "chute": {"ke": 784139.13},
    # /tmp/log.rhodo2 step-0 row (initial velocities come from the data
    # file, so the state is bit-reproducible)
    "rhodo_class": {"temp": 281.9047, "epair": -103081.45,
                    "etotal": -83796.488},
}

SANITY = {
    "lj": {"temp": (0.7574531, 3e-3), "epair": (-5.7585055, 1e-3),
           "etotal": (-4.6223613, 1e-3)},
    "chain": {"temp": (0.9729966, 2e-2), "emol": (20.507698, 5e-3),
              "etotal": (22.40326, 5e-3)},
    "eam": {"temp": (801.832, 1e-2), "epair": (-109957.3, 1e-3),
            "etotal": (-106640.77, 1e-3)},
    "chute": {"ke": (784292.08, 1.5e-3)},
    # reference binary on the peptide-replicated rhodo deck:
    # /tmp/log.rhodo2, step-100 row
    "rhodo_class": {"temp": (302.90763, 2e-2), "epair": (-100551.94, 1e-2),
                    "etotal": (-79735.321, 1e-2)},
    # reference binary on the 60^3-cell 864k melt: /tmp/log.lj864
    "lj864": {"temp": (0.75926567, 3e-3), "epair": (-5.7611846, 1e-3),
              "etotal": (-4.6222874, 1e-3)},
}

# rhodo stand-in: the reference snapshot ships in.rhodo but NO data.rhodo.
# The solvated-peptide example data replicated 2x2x4 gives a 32,064-atom
# system with rhodo's exact force stack and scale (bench/in.rhodo:1-23 is
# 32,000 atoms): CHARMM 8/10 real-space + dihedrals w/ 1-4 pairs +
# impropers + PPPM 1e-4 + mass-selected SHAKE + z-coupled NPT.  Targets
# regenerated with the locally built reference binary on THIS deck
# (tools/gen_bench_targets.sh -> /tmp/log.rhodo2).
RHODO_CLASS = """
units           real
neigh_modify    delay 5 every 1
atom_style      full
bond_style      harmonic
angle_style     charmm
dihedral_style  charmm
improper_style  harmonic
pair_style      lj/charmm/coul/long 8.0 10.0
pair_modify     mix arithmetic
kspace_style    pppm 1e-4
read_data       {golden}/data.peptide
replicate       2 2 4
fix             1 all shake 0.0001 5 0 m 1.0 a 31
fix             2 all npt temp 300.0 300.0 100.0 z 0.0 0.0 1000.0 mtk no pchain 0 tchain 1
special_bonds   charmm
timestep        2.0
"""


def build(deck_name):
    from tpumd.script.parser import LammpsScript
    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    script = LammpsScript(dtype=dtype, data_dir=BENCH)
    if deck_name == "lj":
        script.run_string(IN_LJ.format(n=20))
    elif deck_name == "lj864":
        script.run_string(IN_LJ.format(n=60))
    elif deck_name == "rhodo_class":
        golden = os.path.join(REPO, "tests", "golden", "peptide")
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


def check_sanity(name, sim):
    """Compare the current thermo row against the step-100 reference."""
    fails = {}
    vals = {}
    for key, spec in SANITY[name].items():
        target, rtol = spec[0], spec[1]
        scale = max(abs(target), spec[2] if len(spec) > 2 else 0.0)
        val = float(sim.last_thermo[key])
        vals[key] = val
        if abs(val - target) > scale * rtol:
            fails[key] = (val, target, rtol)
    return vals, fails


def check_step0(name, sim):
    """Tight deterministic gate BEFORE any perf number is taken."""
    fails = {}
    targets = STEP0.get(name, {})
    if not targets:
        print(f"[{name}] WARNING: no step-0 targets — gate skipped",
              file=sys.stderr)
    for key, target in targets.items():
        val = float(sim.last_thermo[key])
        if abs(val - target) > max(abs(target), 1.0) * STEP0_RTOL:
            fails[key] = (val, target, STEP0_RTOL)
    return fails


def bench_drift(nsteps=1000, every=100):
    """North-star conservation metric (BASELINE.md): relative total-
    energy drift of the 32k LJ melt over ``nsteps`` NVE steps at the
    benchmark precision (f32 on TPU).  The reference's own f64 runs
    hold |dE/E| ~ 1e-6 over this window (bench/log.6Oct16.lj.fixed
    thermo tables); this measures what our engine holds on the chip."""
    sim = build("lj")
    sim.run(500)                 # equilibrate past the violent melt
    sim.run(0)
    e0 = float(sim.last_thermo["etotal"])
    emax = 0.0
    for _ in range(nsteps // every):
        sim.run(every)
        emax = max(emax, abs(float(sim.last_thermo["etotal"]) - e0))
    drift = emax / abs(e0)
    # f32 on the chip holds ~1e-4..1e-5 over 1k steps; the f64 CPU path
    # (conftest precision) holds the reference's ~1e-6 north star
    tol = 2e-4 if jax.default_backend() != "cpu" else 3e-6
    return {"deck": "drift", "natoms": sim.natoms, "steps": nsteps,
            "etotal0": round(e0, 8), "max_abs_dE": round(emax, 9),
            "rel_drift": float(f"{drift:.3e}"),
            "sanity_ok": bool(drift < tol),
            "backend": jax.default_backend()}


def bench_deck(name, nsteps):
    if name == "drift":
        return bench_drift()
    sim = build(name)
    sim.run(0)                   # setup + step-0 thermo
    fails0 = check_step0(name, sim)
    if fails0:
        return {"deck": name, "sanity_ok": False, "step0_fails": {
            k: list(v) for k, v in fails0.items()},
            "error": "step-0 energy gate failed"}
    t0 = time.perf_counter()
    sim.run(100)                 # compile + sanity window
    compile_s = time.perf_counter() - t0
    vals, fails = check_sanity(name, sim)
    t0 = time.perf_counter()
    sim.run(nsteps)              # warmup at the timed length
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sim.run(nsteps)              # timed (dyn segments -> fully cached)
    dt = time.perf_counter() - t0
    sps = nsteps / dt
    matom = sps * sim.natoms / 1e6
    mode = "cellgrid" if sim._ctx.is_cellgrid else "matrix"
    base = BASELINES[name]
    return {
        "deck": name, "natoms": sim.natoms, "steps": nsteps,
        "timesteps_per_s": round(sps, 3),
        "matom_steps_per_s": round(matom, 4),
        "baseline": base,
        "vs_baseline": round(matom / base, 2),
        "engine": mode, "compile_s": round(compile_s, 1),
        "warm_segment_s": round(warm_s, 1),
        "sanity_ok": not fails,
        "sanity": {k: round(v, 6) for k, v in vals.items()},
        "sanity_fails": {k: list(v) for k, v in fails.items()},
        "backend": jax.default_backend(),
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    decks = args or ["lj", "chain", "eam", "chute", "rhodo_class", "lj864"]
    nsteps = 500 if jax.default_backend() != "cpu" else 100
    for a in sys.argv[1:]:
        if a.startswith("--steps"):
            nsteps = int(a.split("=")[1])
    results = []
    for name in decks:
        try:
            r = bench_deck(name, nsteps)
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
    bad = [r["deck"] for r in results
           if r.get("error") or not r.get("sanity_ok")]
    if bad:
        print(f"SANITY/ERROR failures: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
