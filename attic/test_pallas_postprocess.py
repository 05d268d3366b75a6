"""Pallas derandomize+translate kernels vs the jnp cores (interpret mode).

ATTIC: run manually with `python -m pytest attic/ -q` from the repo root.
"""
import os, sys
sys.path.insert(0, os.path.dirname(__file__))  # attic is standalone


import numpy as np
import pytest

import jax.numpy as jnp

from pallas_postprocess import BLOCK, fused_postprocess_core
from kbo_tpu.kernels.postprocess import derandomize_core, translate_core


def _lipschitz(rng, L, k):
    steps = rng.choice([1, 1, 1, 0, -3, -9, -30], size=L)
    out = np.zeros(L, dtype=np.int32)
    cur = int(rng.integers(0, k + 1))
    for i in range(L):
        out[i] = cur
        cur = int(min(max(cur + steps[i], 0), k))
    return out


@pytest.mark.parametrize("seed,k,t", [(0, 31, 11), (1, 63, 22), (2, 15, 5)])
def test_fused_pallas_matches_jnp(seed, k, t):
    rng = np.random.default_rng(seed)
    L = 2 * BLOCK
    true_len = L - 777
    noisy = _lipschitz(rng, L, k)
    noisy[true_len:] = 0

    ms = jnp.asarray(noisy)
    want_d = derandomize_core(ms, k, t, jnp.int32(true_len))
    want = translate_core(want_d, k, t, jnp.int32(true_len))
    got = fused_postprocess_core(
        ms, k, t, jnp.int32(true_len), interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(got[:true_len]),
        np.asarray(want[:true_len]).astype(np.int32),
    )
