"""Golden parity for pair-breadth wave 2 vs the reference binary:
10-step NVE on a 256-atom fcc melt (neutral styles) or a two-type
half-box +/-0.5e charged variant (coulomb styles), final thermo exact
to printed digits.  Expected values generated with the locally built
reference binary (cmake build of /root/reference)."""

import pytest

from tpumd.script.parser import LammpsScript

NEUTRAL = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style {ps}
pair_coeff 1 1 {coeff}
neighbor 0.3 bin
neigh_modify delay 0 every 5 check no
fix 1 all nve
thermo 10
run 10
"""

CHARGED = """
units lj
atom_style charge
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 2 box
create_atoms 1 box
region left block 0 2 0 4 0 4
set region left type 2
set type 1 charge 0.5
set type 2 charge -0.5
mass 1 1.0
mass 2 1.0
velocity all create 1.44 87287 loop geom
pair_style {ps}
{coeffs}
{kspace}neighbor 0.3 bin
neigh_modify delay 0 every 5 check no
fix 1 all nve
thermo 10
run 10
"""

# name -> (pair_style args, pair_coeff, kspace line, (temp, epair,
# etotal, press) after 10 steps from the reference binary)
NEUTRAL_CASES = {
    "zbl": ("zbl 1.5 2.0", "29 29",
            (0.9156246, 24.914491, 26.282563, 38.360406)),
    "nm/cut": ("nm/cut 2.5", "1.0 1.12 10 5",
               (1.2109563, -7.4039739, -5.5946349, -3.4268538)),
    "mie/cut": ("mie/cut 2.5", "1.0 1.0 14 7",
                (1.1696021, -5.3091742, -3.5616242, -2.8425779)),
    "lj/gromacs": ("lj/gromacs 2.0 2.5", "1.0 1.0",
                   (1.1321367, -5.5908843, -3.8993128, -2.4161031)),
    "lj/smooth/linear": ("lj/smooth/linear 2.5", "1.0 1.0",
                         (1.1317617, -5.2336186, -3.5426075, -2.0425754)),
    "harmonic/cut": ("harmonic/cut", "2.0 1.5",
                     (1.4132878, 1.2106342, 3.3222849, 3.611114)),
    "lj/class2": ("lj/class2 2.5", "1.0 1.0",
                  (1.4484204, -4.7520961, -2.5879524, -4.1111104)),
}

CHARGED_CASES = {
    "coul/dsf": ("coul/dsf 0.8 2.5", "pair_coeff * *", "",
                 (1.4377457, 0.045044763, 2.1932391, 1.3943531)),
    "coul/wolf": ("coul/wolf 0.8 2.5", "pair_coeff * *", "",
                  (1.4377457, 0.063789905, 2.2119842, 1.3943531)),
    "coul/long": ("coul/long 2.5", "pair_coeff * *",
                  "kspace_style pppm 1e-4\n",
                  (1.4370883, 0.83642479, 2.9836368, 1.4566789)),
    "buck/coul/cut": ("buck/coul/cut 2.5", "pair_coeff * * 100.0 0.5 1.0",
                      "", (1.3144026, 90.545199, 92.509101, 73.827458)),
    "buck/coul/long": ("buck/coul/long 2.5",
                       "pair_coeff * * 100.0 0.5 1.0",
                       "kspace_style pppm 1e-4\n",
                       (1.3135829, 89.534065, 91.496742, 73.552026)),
    "born/coul/long": ("born/coul/long 2.5",
                       "pair_coeff * * 10.0 0.4 1.0 1.0 0.5",
                       "kspace_style pppm 1e-4\n",
                       (1.1862023, 53.023826, 54.796179, 52.307971)),
    "lj/class2/coul/cut": ("lj/class2/coul/cut 2.5",
                           "pair_coeff * * 1.0 1.0", "",
                           (1.4464901, -2.9043117, -0.74305213,
                            -3.5922843)),
    "lj/class2/coul/long": ("lj/class2/coul/long 2.5",
                            "pair_coeff * * 1.0 1.0",
                            "kspace_style pppm 1e-4\n",
                            (1.4453105, -3.9154237, -1.7559266,
                             -3.8648329)),
}


def check(script, want, rel=1e-6):
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(want[0], rel=rel)
    assert v["epair"] == pytest.approx(want[1], rel=rel)
    assert v["etotal"] == pytest.approx(want[2], rel=rel)
    assert v["press"] == pytest.approx(want[3], rel=1e-5)


@pytest.mark.parametrize("name", sorted(NEUTRAL_CASES))
def test_pair_neutral(name):
    ps, coeff, want = NEUTRAL_CASES[name]
    script = LammpsScript()
    script.run_string(NEUTRAL.format(ps=ps, coeff=coeff))
    check(script, want)


@pytest.mark.parametrize("name", sorted(CHARGED_CASES))
def test_pair_charged(name):
    ps, coeffs, kspace, want = CHARGED_CASES[name]
    script = LammpsScript()
    script.run_string(CHARGED.format(ps=ps, coeffs=coeffs, kspace=kspace))
    check(script, want)


def test_pppm_ad():
    """kspace_modify diff ad: analytic-differentiation PPPM — qopt grid
    selection, ad Green's function, single inverse FFT + derivative
    weights + self-force correction (src/KSPACE/pppm.cpp
    differentiation_flag==1).  Golden vs the reference binary."""
    ps, coeffs, _, _ = CHARGED_CASES["coul/long"]
    script = LammpsScript()
    script.run_string(CHARGED.format(
        ps=ps, coeffs=coeffs,
        kspace="kspace_style pppm 1e-4\nkspace_modify diff ad\n"))
    ks = script.sim.kspace
    assert (ks.nx, ks.ny, ks.nz) == (24, 24, 24)  # reference grid
    v = script.sim.last_thermo
    assert v["temp"] == pytest.approx(1.4370876, rel=1e-6)
    assert v["epair"] == pytest.approx(0.83642431, rel=1e-6)
    assert v["etotal"] == pytest.approx(2.9836353, rel=1e-6)
    assert v["press"] == pytest.approx(1.4568225, rel=1e-5)


def test_pppm_cg():
    """kspace_style pppm/cg: identical physics to pppm (the reference
    skips zero-charge atoms; the dense TPU path already does) — same
    golden values as the pppm coul/long case."""
    ps, coeffs, _, want = CHARGED_CASES["coul/long"]
    script = LammpsScript()
    script.run_string(CHARGED.format(
        ps=ps, coeffs=coeffs, kspace="kspace_style pppm/cg 1e-4\n"))
    check(script, want)
