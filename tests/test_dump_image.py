"""dump image: PPM rendering sanity (src/dump_image.cpp analog)."""

import os

import numpy as np

from tpumd.script.parser import LammpsScript

DECK = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 3 0 3 0 3
create_box      1 box
create_atoms    1 box
mass            1 1.0
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all nve
dump            1 all image 2 img.*.ppm type type size 128 128 zoom 1.4
run             2
"""


def test_dump_image_renders_ppm(tmp_path):
    script = LammpsScript(data_dir=str(tmp_path))
    script.run_string(DECK)
    p0 = os.path.join(tmp_path, "img.0.ppm")
    p2 = os.path.join(tmp_path, "img.2.ppm")
    assert os.path.exists(p0) and os.path.exists(p2)
    with open(p0, "rb") as fh:
        assert fh.readline() == b"P6\n"
        assert fh.readline().split() == [b"128", b"128"]
        assert fh.readline() == b"255\n"
        pix = np.frombuffer(fh.read(), np.uint8).reshape(128, 128, 3)
    # 108 spheres must cover a visible fraction of the frame, type-1 red
    lit = (pix.sum(-1) > 30)
    assert 0.05 < lit.mean() < 0.95
    assert pix[..., 0].sum() > pix[..., 2].sum()  # red dominates


def test_dump_movie_streams_frames(tmp_path):
    """dump movie appends every frame to ONE P6 stream file — the exact
    bytes src/dump_movie.cpp would feed ffmpeg's image2pipe."""
    deck = DECK.replace("dump            1 all image 2 img.*.ppm type type "
                        "size 128 128 zoom 1.4",
                        "dump            1 all movie 2 mov.ppm type type "
                        "size 64 64 zoom 1.4")
    script = LammpsScript(data_dir=str(tmp_path))
    script.run_string(deck)
    p = os.path.join(tmp_path, "mov.ppm")
    assert os.path.exists(p)
    data = open(p, "rb").read()
    # frames at steps 0 and 2: two P6 headers in one stream
    assert data.count(b"P6\n64 64\n255\n") == 2
    framelen = len(b"P6\n64 64\n255\n") + 64 * 64 * 3
    assert len(data) == 2 * framelen
