"""Chunk compute family golden parity (src/compute_*_chunk.cpp):
com/vcm/gyration/temp/angmom/torque/inertia/omega/msd per molecule
chunk on the water box, plus momentum, count/type, msd/nongauss and
gyration/shape, all against the reference binary's ave/time vector
files and thermo columns.  Step-0 values compare tightly (identical
states); step-10 values at 1e-5 (the reference's 12-bit erfc pair
tables give ~1e-7 trajectory drift on coul/long decks)."""

import os
import shutil
import tempfile

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "chunk_family")


def _snapshots(path):
    """{timestep: (rows, cols) array} from an ave/time vector file."""
    out = {}
    lines = [ln for ln in open(path) if not ln.startswith("#")]
    i = 0
    while i < len(lines):
        step, nrows = lines[i].split()
        step, nrows = int(step), int(nrows)
        rows = [[float(v) for v in lines[i + 1 + k].split()[1:]]
                for k in range(nrows)]
        out[step] = np.array(rows)
        i += 1 + nrows
    return out


@pytest.fixture(scope="module")
def chunk_sim():
    tmpdir = tempfile.mkdtemp(prefix="tpumd_chunk_")
    shutil.copy(os.path.join(GOLDEN, "data.water"), tmpdir)
    deck = open(os.path.join(GOLDEN, "in.chk")).read()
    # strip the file-writing fixes: we compare compute outputs directly
    deck = "\n".join(ln for ln in deck.splitlines()
                     if not ln.startswith("fix             a"))
    pre, runline = deck.rsplit("\nrun", 1)
    script = LammpsScript(data_dir=tmpdir)
    script.run_string(pre + "\nrun 0\n")
    vals0 = {cid: np.asarray(c.evaluate(script.sim))
             for cid, c in script.sim.computes.items()
             if cid.startswith("c")}
    script.run_string("run 10")
    vals10 = {cid: np.asarray(c.evaluate(script.sim))
              for cid, c in script.sim.computes.items()
              if cid.startswith("c")}
    return vals0, vals10


FILES = {"c1": "out.com", "c2": "out.vcm", "c3": "out.gyr",
         "c4": "out.tmp", "c5": "out.ang", "c6": "out.trq",
         "c7": "out.ine", "c8": "out.omg", "c9": "out.msd"}


@pytest.mark.parametrize("cid", sorted(FILES))
def test_chunk_compute(cid, chunk_sim):
    vals0, vals10 = chunk_sim
    snaps = _snapshots(os.path.join(GOLDEN, FILES[cid]))
    for step, vals in ((0, vals0), (10, vals10)):
        ref = snaps[step]
        ours = vals[cid]
        if ours.ndim == 1:
            ours = ours[:, None]
        assert ours.shape == ref.shape, (cid, step)
        # the ave/time files carry %g precision (~6 sig figs)
        scale = max(1.0, np.abs(ref).max())
        tol = 1e-5 if step == 0 else 5e-5
        np.testing.assert_allclose(ours, ref, rtol=2e-5,
                                   atol=tol * scale,
                                   err_msg=f"{cid} step {step}")


def test_misc_computes(chunk_sim):
    vals0, vals10 = chunk_sim
    # thermo columns at step 10 from the reference log:
    # step temp cm[1] cm[3] ct[1] cn[1] cn[3] cg[3] cg[6]
    rows = []
    active = False
    for ln in open(os.path.join(GOLDEN, "log.chk")).read().splitlines():
        if ln.strip().startswith("Step"):
            active = True
            continue
        if active:
            p = ln.split()
            if not p or not p[0].lstrip("-").isdigit():
                active = False
                continue
            rows.append([float(v) for v in p])
    last = rows[-1]
    assert vals10["ct"][0] == pytest.approx(last[4])
    assert vals10["cn"][0] == pytest.approx(last[5], rel=2e-5)
    assert vals10["cn"][2] == pytest.approx(last[6], rel=2e-4)
    assert vals10["cg"][2] == pytest.approx(last[7], rel=2e-5)
    assert vals10["cg"][5] == pytest.approx(last[8], rel=1e-2, abs=1e-7)
    assert np.abs(vals10["cm"]).max() < 1e-10  # momentum conserved ~0


def test_ave_time_vector_files():
    """ave/time mode vector writes the reference file layout (TimeStep
    Number-of-rows header + Row lines) with step-0 setup output."""
    tmpdir = tempfile.mkdtemp(prefix="tpumd_avvec_")
    shutil.copy(os.path.join(GOLDEN, "data.water"), tmpdir)
    script = LammpsScript(data_dir=tmpdir)
    script.run_string(open(os.path.join(GOLDEN, "in.chk")).read())
    for f in ("out.com", "out.tmp", "out.ine"):
        ref = _snapshots(os.path.join(GOLDEN, f))
        ours = _snapshots(os.path.join(tmpdir, f))
        assert sorted(ref) == sorted(ours) == [0, 10]
        for st in (0, 10):
            scale = max(1.0, np.abs(ref[st]).max())
            np.testing.assert_allclose(ours[st], ref[st],
                                       atol=5e-5 * scale, rtol=2e-5)
