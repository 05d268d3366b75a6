"""Clamped-LCP scan kernel: Pallas (interpret mode) and jnp fallback vs an
independent sequential oracle, and the clamp recurrence vs brute force."""

import numpy as np
import pytest

import jax.numpy as jnp

from kbo_tpu.kernels.ms import _clamp_scan_jnp, _common2, _common3, _edge_lcp
from kbo_tpu.kernels.pallas_join import BLOCK, clamp_scan


def _common_np(words, i, j, bits):
    per = 16 if bits == 2 else 10
    lead = 0 if bits == 2 else 2
    total = 0
    for w in range(len(words)):
        x = int(words[w][i]) ^ int(words[w][j])
        if x == 0:
            total += per
            continue
        lz = 32 - x.bit_length()
        total += (lz - lead) // bits
        break
    return total


def _oracle_scan(words, cap, bits, reverse):
    """Sequential clamp recurrence (independent of the doubling/Pallas
    scan structure)."""
    M = cap.size
    out = np.empty(M, dtype=np.int64)
    order = range(M - 1, -1, -1) if reverse else range(M)
    x = -1
    prev = None
    for i in order:
        if prev is not None:
            x = min(x, _common_np(words, prev, i, bits))
        x = max(x, int(cap[i]))
        out[i] = x
        prev = i
    return out


def _sorted_words(rng, M, W, bits):
    top = 0xFFFFFFFF if bits == 2 else 0x3FFFFFFF
    raw = [
        rng.integers(0, 17, M).astype(np.uint32) * (top // 16)
        for _ in range(W)
    ]
    order = np.lexsort(tuple(reversed(raw)))
    return [w[order] for w in raw]


@pytest.mark.parametrize("seed,bits,W,reverse", [
    (0, 2, 2, False), (1, 2, 2, True), (2, 3, 4, False), (3, 3, 4, True),
])
def test_clamp_scan_interpret(seed, bits, W, reverse):
    rng = np.random.default_rng(seed)
    M = 2 * BLOCK
    words = _sorted_words(rng, M, W, bits)
    per = 16 if bits == 2 else 10
    cap = np.where(
        rng.random(M) < 0.4, rng.integers(0, W * per + 1, M), -1
    ).astype(np.int32)

    got = np.asarray(
        clamp_scan(
            [jnp.asarray(w) for w in words],
            jnp.asarray(cap),
            bits,
            reverse,
            interpret=True,
        )
    )
    want = _oracle_scan(words, cap, bits, reverse)
    np.testing.assert_array_equal(got, want)

    common_fn = _common2 if bits == 2 else _common3
    jw = [jnp.asarray(w) for w in words]
    got_jnp = np.asarray(
        _clamp_scan_jnp(
            _edge_lcp(jw, common_fn, reverse), jnp.asarray(cap), reverse
        )
    )
    np.testing.assert_array_equal(got_jnp, want)


@pytest.mark.parametrize("seed,bits", [(5, 2), (6, 3)])
def test_clamp_recurrence_matches_bruteforce(seed, bits):
    """On sorted keys, the path-min recurrence equals the direct
    max-over-sources of min(lcp, cap) (the LCP lemma)."""
    rng = np.random.default_rng(seed)
    M, W = 300, 2
    words = _sorted_words(rng, M, W, bits)
    per = 16 if bits == 2 else 10
    cap = np.where(
        rng.random(M) < 0.3, rng.integers(0, W * per + 1, M), -1
    ).astype(np.int32)

    fwd = _oracle_scan(words, cap, bits, reverse=False)
    bwd = _oracle_scan(words, cap, bits, reverse=True)
    for i in range(M):
        best_f = best_b = -1
        for s in range(M):
            if cap[s] < 0:
                continue
            lcp = W * per if s == i else _common_np(words, s, i, bits)
            v = min(lcp, int(cap[s]))
            if s <= i:
                best_f = max(best_f, v)
            if s >= i:
                best_b = max(best_b, v)
        assert fwd[i] == best_f, (i, fwd[i], best_f)
        assert bwd[i] == best_b, (i, bwd[i], best_b)
