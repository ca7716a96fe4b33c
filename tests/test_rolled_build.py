"""The roll-based matrix neighbor rebuild (ops/neighbor.py _build_rolled)
must produce exactly the brute-force neighbor SET per atom — it replaces
the gather-based lax.map build on TPU (65 ms -> ~11 ms at the 32k chute
bench) and must stay set-identical (row order may differ; no consumer
depends on it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpumd.core.state import Box
import tpumd.ops.neighbor as nb


@pytest.mark.parametrize("seed,periodic", [
    (0, (True, True, True)),
    (1, (False, True, False)),
    (2, (True, False, True)),
])
def test_rolled_build_matches_bruteforce(seed, periodic):
    rng = np.random.default_rng(seed)
    n = 500
    L = rng.uniform(8.0, 12.0, size=3)
    x = rng.uniform(0, 1, size=(n, 3)) * L
    box = Box(lo=jnp.zeros(3), hi=jnp.asarray(L), tilt=jnp.zeros(3),
              periodic=periodic)
    cut = 2.0
    cfg = nb.choose_config(box, cut, 0.3, n)
    assert not cfg.image_shifts
    idx, cnt, over = jax.jit(
        nb._build_rolled, static_argnames=("cfg",))(
        jnp.asarray(x), box, cfg, jnp.ones((n,), jnp.int32))
    idx = np.asarray(idx)
    cnt = np.asarray(cnt)

    d = x[:, None, :] - x[None, :, :]
    for c in range(3):
        if periodic[c]:
            d[:, :, c] -= L[c] * np.round(d[:, :, c] / L[c])
    r2 = (d ** 2).sum(-1)
    np.fill_diagonal(r2, 1e9)
    bad = 0
    for i in range(n):
        want = set(np.nonzero(r2[i] < cut * cut)[0].tolist())
        got = set(idx[i][idx[i] != i].tolist())
        if want != got:
            bad += 1
        assert cnt[i] == len(want)
    assert bad == 0 and not bool(over)


def test_rolled_build_exclusions():
    """neigh_modify exclude group pairs drop both directions."""
    rng = np.random.default_rng(3)
    n = 300
    L = np.array([9.0, 9.0, 9.0])
    x = rng.uniform(0, 1, size=(n, 3)) * L
    gmask = (1 + (rng.integers(0, 2, size=n) * 2)).astype(np.int32)  # 1|3
    box = Box(lo=jnp.zeros(3), hi=jnp.asarray(L), tilt=jnp.zeros(3),
              periodic=(True, True, True))
    cfg = nb.choose_config(box, 2.0, 0.3, n)
    cfg = nb.dataclasses.replace(cfg, exclude_bits=((2, 2),))
    idx, cnt, over = jax.jit(
        nb._build_rolled, static_argnames=("cfg",))(
        jnp.asarray(x), box, cfg, jnp.asarray(gmask))
    idx = np.asarray(idx)
    d = x[:, None, :] - x[None, :, :]
    for c in range(3):
        d[:, :, c] -= L[c] * np.round(d[:, :, c] / L[c])
    r2 = (d ** 2).sum(-1)
    np.fill_diagonal(r2, 1e9)
    for i in range(n):
        want = {j for j in np.nonzero(r2[i] < 4.0)[0].tolist()
                if not (gmask[i] & 2 and gmask[j] & 2)}
        got = set(idx[i][idx[i] != i].tolist())
        assert want == got, i
