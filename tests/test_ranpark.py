"""RanPark RNG unit tests against hand-computed reference values.

The scalar sequence is the textbook Park-Miller minimal standard; the
first draws from seed 87287 are computed here independently with exact
integer arithmetic (same recurrence as src/random_park.cpp).
"""

import numpy as np

from tpumd.utils.ranpark import (RanPark, geom_uniform_triplets,
                                 jenkins_coord_seed, park_next)

IA, IM, IQ, IR = 16807, 2147483647, 127773, 2836


def _ref_next(seed: int) -> int:
    # plain Lehmer step, no Schrage: IA*seed mod IM (equivalent)
    return (IA * seed) % IM


def test_park_matches_lehmer():
    r = RanPark(87287)
    seed = 87287
    for _ in range(100):
        seed = _ref_next(seed)
        assert abs(r.uniform() - seed / IM) < 1e-15
        assert r.seed == seed


def test_vectorized_matches_scalar():
    seeds = np.array([1, 87287, 2147483646, 12345], dtype=np.int64)
    s = seeds.copy()
    for _ in range(10):
        s, u = park_next(s)
    for i, s0 in enumerate(seeds):
        r = RanPark(int(s0))
        for _ in range(10):
            val = r.uniform()
        assert abs(val - u[i]) < 1e-15
        assert r.seed == s[i]


def test_jenkins_hash_known_value():
    # independently computed Jenkins one-at-a-time over the same 28 bytes
    def ref_hash(seed, coord):
        data = (np.int32(seed).tobytes()
                + np.asarray(coord, dtype="<f8").tobytes())
        h = 0
        mask = 0xFFFFFFFF
        for b in data:
            sb = b - 256 if b >= 128 else b  # C char is signed
            h = (h + sb) & mask
            h = (h + (h << 10)) & mask
            h ^= h >> 6
        h = (h + (h << 3)) & mask
        h ^= h >> 11
        h = (h + (h << 15)) & mask
        s = h & 0x7FFFFFF
        return s if s else 1

    coords = np.array([[0.0, 0.0, 0.0], [1.5, -2.25, 33.0],
                       [0.1, 0.2, 0.3]])
    got = jenkins_coord_seed(87287, coords)
    for i in range(3):
        assert got[i] == ref_hash(87287, coords[i])


def test_geom_triplets_determinism_and_range():
    coords = np.random.RandomState(0).uniform(0, 30, size=(100, 3))
    u1 = geom_uniform_triplets(87287, coords)
    u2 = geom_uniform_triplets(87287, coords)
    assert np.array_equal(u1, u2)
    assert (u1 > 0).all() and (u1 < 1).all()
    # different seed => different draws
    u3 = geom_uniform_triplets(87288, coords)
    assert not np.allclose(u1, u3)
