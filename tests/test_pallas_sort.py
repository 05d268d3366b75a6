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
