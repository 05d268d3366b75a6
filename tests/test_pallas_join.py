"""Pallas nearest-reference propagation kernel vs jnp (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kbo_tpu.kernels.ms import _common2, _common3, _propagate_nearest
from kbo_tpu.kernels.pallas_join import BLOCK, nearest_common


@pytest.mark.parametrize("seed,bits,W,reverse", [
    (0, 2, 2, False), (1, 2, 2, True), (2, 3, 4, False), (3, 3, 4, True),
])
def test_nearest_common_interpret(seed, bits, W, reverse):
    rng = np.random.default_rng(seed)
    M = 2 * BLOCK
    top = 0xFFFFFFFF if bits == 2 else 0x3FFFFFFF
    words = [
        jnp.asarray(rng.integers(0, 17, M).astype(np.uint32) * (top // 16))
        for _ in range(W)
    ]
    rank = jnp.asarray((rng.random(M) < 0.4).astype(np.int32))  # 0=ref

    got = np.asarray(
        nearest_common(words, rank, bits, reverse, interpret=True)
    )

    is_ref = np.asarray(rank) == 0
    pv, pok = _propagate_nearest(list(words), jnp.asarray(is_ref), reverse)
    common = _common2 if bits == 2 else _common3
    want = np.asarray(
        jnp.where(pok, common(list(words), pv), 0)
    )
    np.testing.assert_array_equal(got, want)
