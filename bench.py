#!/usr/bin/env python
"""Driver benchmark: the full reference deck suite on one chip.

Prints ONE JSON line.  Headline metric stays the 32k LJ melt
(Matom-step/s vs the 1-rank icc baseline, bench/log.6Oct16.lj.fixed.icc.1);
the `decks` field carries every deck's throughput, multiplier, and tight
step-100 thermo sanity vs the reference binary (tools/bench_all.py),
including the 864k-atom LJ melt north-star row.

Deck selection: TPUMD_BENCH_DECKS="lj chain ..." (default: all six).
Exits non-zero if any deck errors or misses its sanity window.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    from tools import bench_all

    decks = os.environ.get(
        "TPUMD_BENCH_DECKS",
        "lj chain eam chute rhodo_class lj864 drift").split()
    nsteps = 500
    import jax
    if jax.default_backend() == "cpu":
        nsteps = 100
    results = []
    for name in decks:
        try:
            r = bench_all.bench_deck(name, nsteps)
        except Exception as e:  # noqa: BLE001
            r = {"deck": name, "error": f"{type(e).__name__}: {e}"}
        results.append(r)
        print(json.dumps(r), file=sys.stderr, flush=True)

    by = {r["deck"]: r for r in results}
    lj = by.get("lj", {})
    out = {
        "metric": "lj_melt_32k_matom_steps_per_s",
        "value": lj.get("matom_steps_per_s", 0.0),
        "unit": "Matom-step/s",
        "vs_baseline": round(lj.get("matom_steps_per_s", 0.0)
                             / bench_all.BASELINES["lj"], 3),
        "decks": {
            r["deck"]: ({"error": r["error"]} if "error" in r else
                        ({"rel_drift": r["rel_drift"],
                          "sanity_ok": r["sanity_ok"]}
                         if r["deck"] == "drift" else {
                "matom_steps_per_s": r["matom_steps_per_s"],
                "vs_baseline": r["vs_baseline"],
                "engine": r["engine"],
                "sanity_ok": r["sanity_ok"],
            })) for r in results
        },
    }
    print(json.dumps(out), flush=True)

    # persist the full table for the repo record
    table_path = os.path.join(REPO, "BENCH_TABLE.json")
    table = []
    if os.path.exists(table_path):
        with open(table_path) as fh:
            table = json.load(fh)
    merged = {r["deck"]: r for r in table}
    merged.update(by)
    with open(table_path, "w") as fh:
        json.dump(list(merged.values()), fh, indent=1)

    bad = [r["deck"] for r in results
           if r.get("error") or not r.get("sanity_ok")]
    if bad:
        print(f"ERROR: sanity/error failures: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
