"""Parallel tempering (temper command) — multi-replica Universe analog."""

import numpy as np

from tpumd.script.parser import LammpsScript

DECK = """
units           lj
atom_style      atomic
variable        t world 0.7 0.8 0.9 1.0
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create $t 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
neigh_modify    delay 0 every 5 check no
fix             1 all nvt temp $t $t 0.5
temper          120 30 $t 1 3847 58382
"""


def test_temper_runs_and_swaps():
    s = LammpsScript()
    s.run_string(DECK)
    sims = s.replicas
    assert len(sims) == 4
    # every replica advanced the full horizon and is finite
    for sim in sims:
        assert sim.step == 120
        assert np.isfinite(sim.last_thermo["etotal"])
    # with closely spaced temperatures most attempts should be accepted
    acc = sum(a for a, _ in s.temper_accepts)
    att = sum(n for _, n in s.temper_accepts)
    assert att >= 4
    assert acc >= 1
    # replicas ended at distinct thermostat targets: mean KE ordering is
    # statistical, but each sim's thermostat target must differ
    targets = [sim.fixes[0].t_start for sim in sims]
    assert sorted(targets) == [0.7, 0.8, 0.9, 1.0]


def test_temper_batched_matches_sequential(monkeypatch):
    """The concurrent (stacked-lane, replica-sharded) path must produce
    the same swap decisions and statistics as the sequential per-sim
    loop — same Metropolis draw order, same physics."""
    import tpumd.md.temper as tp

    s_seq = LammpsScript()
    monkeypatch.setattr(tp, "_can_batch", lambda sims: False)
    s_seq.run_string(DECK)
    monkeypatch.undo()

    s_bat = LammpsScript()
    calls = {"batched": 0}
    orig = tp._temper_batched

    def spy(*a, **kw):
        calls["batched"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(tp, "_temper_batched", spy)
    s_bat.run_string(DECK)
    assert calls["batched"] == 1

    assert s_bat.temper_accepts == s_seq.temper_accepts
    for sa, sb in zip(s_seq.replicas, s_bat.replicas):
        assert sa.step == sb.step == 120
        # identical math, identical swap ops — bitwise-equal trajectories
        # on CPU f64 (last_thermo differs by convention: the batched path
        # re-evaluates thermo AFTER the final swap)
        assert np.array_equal(np.asarray(sa.state.x),
                              np.asarray(sb.state.x))
        assert np.array_equal(np.asarray(sa.state.v),
                              np.asarray(sb.state.v))
