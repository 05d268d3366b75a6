"""Pallas bitonic merge vs numpy (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kbo_tpu.kernels.pallas_sort import bitonic_merge


@pytest.mark.parametrize("seed,na,nb", [(0, 200_000, 150_000), (1, 1000, 130_000)])
def test_bitonic_merge_interpret(seed, na, nb):
    rng = np.random.default_rng(seed)

    def make(n, rank):
        w0 = rng.integers(0, 50, n).astype(np.uint32)  # many cross-side ties
        w1 = rng.integers(0, 2**32, n, dtype=np.uint32)
        r = np.full(n, rank, dtype=np.int32)
        pay = rng.integers(0, 2**31 - 1, n).astype(np.int32)
        order = np.lexsort((r, w1, w0))
        return [w0[order], w1[order], r[order], pay[order]]

    a = make(na, 0)
    b = make(nb, 1)
    out = bitonic_merge(
        [jnp.asarray(x) for x in a],
        [jnp.asarray(x) for x in b],
        n_comps=3,
        interpret=True,
    )
    m = [np.asarray(o) for o in out]

    c = [np.concatenate([x, y]) for x, y in zip(a, b)]
    order = np.lexsort((c[2], c[1], c[0]))
    np.testing.assert_array_equal(m[0], c[0][order])
    np.testing.assert_array_equal(m[1], c[1][order])
    np.testing.assert_array_equal(m[2], c[2][order])
    # payloads travel with their (comps) tuples
    assert sorted(zip(m[0], m[1], m[2], m[3])) == sorted(
        zip(c[0][order], c[1][order], c[2][order], c[3][order])
    )


@pytest.mark.parametrize("seed,n", [(3, 150_000), (4, 65_536)])
def test_bitonic_sort_interpret(seed, n):
    from kbo_tpu.kernels.pallas_sort import bitonic_sort

    rng = np.random.default_rng(seed)
    w0 = rng.integers(0, 97, n).astype(np.uint32)  # plenty of ties
    w1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    pay = np.arange(n, dtype=np.int32)
    out = bitonic_sort(
        [jnp.asarray(w0), jnp.asarray(w1), jnp.asarray(pay)],
        n_comps=2,
        interpret=True,
    )
    m = [np.asarray(o) for o in out]
    order = np.lexsort((w1, w0))
    np.testing.assert_array_equal(m[0], w0[order])
    np.testing.assert_array_equal(m[1], w1[order])
    assert sorted(zip(m[0], m[1], m[2])) == sorted(
        zip(w0[order], w1[order], pay[order])
    )


@pytest.mark.parametrize(
    "seed,na,nb",
    [
        (0, 200_000, 150_000),   # multi-tile, uneven
        (1, 70_000, 10),         # tiny probe side
        (2, 100, 70_000),        # tiny table side
        (5, 40_000, 20_000),     # single tile below BLOCK
        (6, 65_536, 65_536),     # exact tile multiples
    ],
)
def test_merge_path_interpret(seed, na, nb):
    from kbo_tpu.kernels.pallas_sort import BLOCK, merge_path

    rng = np.random.default_rng(seed)

    def mk_sorted(n):
        w0 = rng.integers(0, 2**28, n).astype(np.int64).astype(np.uint32)
        w1 = rng.integers(0, 2**30, n).astype(np.int64).astype(np.uint32)
        pay = rng.integers(0, 2**31, n).astype(np.int64).astype(np.uint32)
        order = np.lexsort((w1, w0))
        return w0[order], w1[order], pay[order]

    a0, a1, ap = mk_sorted(na)
    b0, b1, bp = mk_sorted(nb)
    out = merge_path(
        [jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(ap)],
        [jnp.asarray(b0), jnp.asarray(b1), jnp.asarray(bp)],
        n_comps=2,
        interpret=True,
    )
    m = [np.asarray(o) for o in out]
    total = na + nb
    nt = -(-total // BLOCK)
    assert m[0].shape[0] == nt * BLOCK
    c0 = np.concatenate([a0, b0])
    c1 = np.concatenate([a1, b1])
    cp = np.concatenate([ap, bp])
    order = np.lexsort((c1, c0))
    np.testing.assert_array_equal(m[0][:total], c0[order])
    np.testing.assert_array_equal(m[1][:total], c1[order])
    # payloads match as multisets within equal-key groups (the in-tile
    # network is not stable)
    assert sorted(zip(m[0][:total], m[1][:total], m[2][:total])) == sorted(
        zip(c0[order], c1[order], cp[order])
    )
    # tail pads are all-ones
    assert (m[0][total:] == np.uint32(0xFFFFFFFF)).all()


def test_merge_path_interpret_production_shape():
    # the rows-join shape: 6 comparison words + 1 packed payload
    from kbo_tpu.kernels.pallas_sort import merge_path

    rng = np.random.default_rng(9)

    def mk_sorted(n):
        ws = [rng.integers(0, 2**30, n).astype(np.int64).astype(np.uint32)
              for _ in range(6)]
        pay = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        order = np.lexsort(tuple(ws[::-1]))
        return [w[order] for w in ws], pay[order]

    aw, ap = mk_sorted(100_000)
    bw, bp = mk_sorted(30_000)
    out = merge_path(
        [jnp.asarray(w) for w in aw] + [jnp.asarray(ap)],
        [jnp.asarray(w) for w in bw] + [jnp.asarray(bp)],
        n_comps=6,
        interpret=True,
    )
    m = [np.asarray(o) for o in out]
    tot = 130_000
    cs = [np.concatenate([a, b]) for a, b in zip(aw, bw)]
    cp = np.concatenate([ap, bp])
    order = np.lexsort(tuple(cs[::-1]))
    for w in range(6):
        np.testing.assert_array_equal(m[w][:tot], cs[w][order])
    assert sorted(zip(*[m[w][:tot] for w in range(6)], m[6][:tot])) == sorted(
        zip(*[c[order] for c in cs], cp[order])
    )
