"""Binary dump format parity (DumpAtom::header_binary / write_binary,
src/dump_atom.cpp): our .bin files must byte-layout-match the reference
binary's so tools/binary2txt and downstream readers work unchanged."""

import os
import struct

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bindump")


def read_bin_dump(path):
    """Minimal reader for the reference binary dump format."""
    snaps = []
    with open(path, "rb") as fh:
        while True:
            head = fh.read(8)
            if len(head) < 8:
                break
            marker = struct.unpack("<q", head)[0]
            assert marker < 0, "expected new-format magic marker"
            magic = fh.read(-marker).decode()
            endian, rev = struct.unpack("<ii", fh.read(8))
            assert endian == 1 and rev == 2
            step, ndump = struct.unpack("<qq", fh.read(16))
            (tri,) = struct.unpack("<i", fh.read(4))
            bounds = struct.unpack("<6i", fh.read(24))
            box = struct.unpack("<6d", fh.read(48))
            if tri:
                fh.read(24)
            (size_one,) = struct.unpack("<i", fh.read(4))
            (ulen,) = struct.unpack("<i", fh.read(4))
            fh.read(ulen)
            (tflag,) = struct.unpack("<b", fh.read(1))
            if tflag:
                fh.read(8)
            (clen,) = struct.unpack("<i", fh.read(4))
            columns = fh.read(clen).decode()
            (nchunk,) = struct.unpack("<i", fh.read(4))
            rows = []
            for _ in range(nchunk):
                (nvals,) = struct.unpack("<i", fh.read(4))
                rows.append(np.frombuffer(fh.read(8 * nvals), "<f8"))
            data = np.concatenate(rows).reshape(-1, size_one)
            snaps.append(dict(magic=magic, step=step, ndump=ndump,
                              bounds=bounds, box=box, columns=columns,
                              data=data))
    return snaps


def test_binary_dump_matches_reference(tmp_path):
    deck = open(os.path.join(GOLDEN, "in.test")).read()
    script = LammpsScript(data_dir=str(tmp_path))
    script.run_string(deck)
    ours = read_bin_dump(os.path.join(tmp_path, "dump.bin"))
    ref = read_bin_dump(os.path.join(GOLDEN, "dump.ref.bin"))
    assert len(ours) == len(ref) == 2
    for o, r in zip(ours, ref):
        assert o["magic"] == r["magic"] == "DUMPATOM"
        assert o["step"] == r["step"]
        assert o["ndump"] == r["ndump"] == 108
        assert o["bounds"] == r["bounds"]
        assert o["box"] == pytest.approx(r["box"], abs=0)
        assert o["columns"].split() == r["columns"].split()
        assert o["data"].shape == r["data"].shape
        # id/type columns exact; scaled coords to f64 parity
        np.testing.assert_array_equal(o["data"][:, 0], r["data"][:, 0])
        np.testing.assert_array_equal(o["data"][:, 1], r["data"][:, 1])
        np.testing.assert_allclose(o["data"][:, 2:], r["data"][:, 2:],
                                   rtol=0, atol=1e-12)
