"""Neighbor-list correctness: padded matrix vs brute-force O(N^2) reference."""

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.core.state import Box
from tpumd.ops import neighbor as nb


def brute_pairs(x, box_l, cut):
    n = x.shape[0]
    d = x[:, None, :] - x[None, :, :]
    d -= box_l * np.round(d / box_l)
    r2 = (d * d).sum(-1)
    np.fill_diagonal(r2, 1e30)
    return r2 < cut * cut


def test_neighbor_matches_bruteforce():
    rng = np.random.RandomState(42)
    n, L, cut = 400, 10.0, 2.8
    x = rng.uniform(0, L, size=(n, 3))
    box = Box.orthogonal(np.zeros(3), np.full(3, L))
    cfg = nb.choose_config(box, cut, 0.3, n)
    idx, sbits, max_count, over = jax.jit(
        nb.build_neighbors, static_argnames=("cfg",)
    )(jnp.asarray(x), box, cfg)
    assert not bool(over)

    want = brute_pairs(x, L, cut)
    idx = np.asarray(idx)
    got = np.zeros_like(want)
    for i in range(n):
        for j in idx[i]:
            if j != i:
                got[i, j] = True
    assert int(max_count) == want.sum(1).max()
    np.testing.assert_array_equal(got, want)


def test_neighbor_overflow_flag():
    # cluster all atoms into one cell -> cell_cap and kmax blown
    n = 100
    x = np.random.RandomState(0).uniform(0, 0.5, size=(n, 3))
    box = Box.orthogonal(np.zeros(3), np.full(3, 20.0))
    cfg = nb.choose_config(box, 2.8, 0.3, n, kmax=8)
    *_, over = nb.build_neighbors(jnp.asarray(x), box, cfg)
    assert bool(over)


def test_displacement_check():
    box = Box.orthogonal(np.zeros(3), np.full(3, 10.0))
    x = jnp.asarray(np.random.RandomState(1).uniform(0, 10, (50, 3)))
    xh = x.at[0, 0].add(0.2)
    assert bool(nb.displacement_exceeded(x, xh, box, skin=0.3))
    assert not bool(nb.displacement_exceeded(x, xh, box, skin=0.5))
