"""Climbing-image NEB (neb command + fix neb) — vacancy-hop barrier in a
periodic LJ fcc crystal (ref src/REPLICA/neb.cpp, fix_neb.cpp).

No multi-partition reference binary exists in this image (serial MPI
stubs), so the golden checks are exact physics invariants instead:
- the hop initial/final configurations are lattice mirror images, so
  the forward and backward barriers must be EQUAL (EBF == EBR) and the
  climbing image must sit at the path midpoint;
- the climbing image converges to a saddle: max |F_neb| < ftol;
- the barrier is positive and the endpoint images relax to equal-energy
  minima.
"""
import os

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

RHO = 0.85      # single clean barrier (rho*=1.0 has a metastable
ALAT = (4/RHO) ** (1/3.)   # split-vacancy middle state)


def _deck(tmp_path):
    # 3x3x3 fcc cells, remove the atom at the origin -> vacancy;
    # the hop moves its +x[110]-neighbor at (a/2, a/2, 0) into the site
    hop_from = np.array([0.5 * ALAT, 0.5 * ALAT, 0.0])
    final = tmp_path / "final.neb"
    deck = f"""
units           lj
atom_style      atomic
boundary        p p p
lattice         fcc 0.85
region          box block 0 3 0 3 0 3
create_box      1 box
create_atoms    1 box
mass            1 1.0
region          vac sphere 0.05 0.05 0.0 0.18
delete_atoms    region vac
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all neb 1.0
neb             0.0 1.0e-6 400 900 100 final {final} replicas 8
"""
    return deck, final, hop_from


def _find_tag(script, pos):
    import jax
    x = np.asarray(jax.device_get(script.sim.state.x), np.float64)
    tag = np.asarray(jax.device_get(script.sim.state.tag))
    d = np.abs(x - pos).max(axis=1)
    i = int(np.argmin(d))
    assert d[i] < 1e-6
    return int(tag[i]), x[i]


def test_neb_vacancy_hop(tmp_path, capsys):
    deck, final_path, hop_from = _deck(tmp_path)
    # first pass: build the system only (stop before neb) to find the
    # hopping atom's tag, then write the final-coordinates file
    setup = deck[:deck.index("fix ")]
    s0 = LammpsScript()
    s0.run_string(setup)
    s0._finalize_atoms()
    tag, x_from = _find_tag(s0, hop_from)
    # vacancy site is the deleted origin atom's position
    with open(final_path, "w") as fh:
        fh.write(f"1\n{tag} 0.0 0.0 0.0\n")

    s = LammpsScript()
    s.run_string(deck)
    res = s.neb_result

    assert res["fmax_atom"] < 1.0e-6, "climbing image did not converge"
    ebf, ebr = res["ebf"], res["ebr"]
    assert ebf > 0.05, f"no barrier found (EBF={ebf})"
    # mirror-symmetric hop: forward == backward barrier
    assert abs(ebf - ebr) < 1e-6 * max(abs(ebf), 1.0)
    # endpoints relaxed to equal-energy minima
    e = res["energies"]
    assert abs(e[0] - e[-1]) < 1e-6 * abs(e[0])
    # climbing image at the path midpoint
    climber = res["climber"]
    assert abs(res["rd"][climber] - 0.5) < 0.05
    # energy profile rises to the climber and falls after
    assert np.argmax(e) == climber
