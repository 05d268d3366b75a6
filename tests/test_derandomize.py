"""Golden tests for derandomization (reference: src/derandomize.rs tests + doctests)."""

import numpy as np
import pytest

from kbo_tpu.ops.derandomize import (
    derandomize_ms_val,
    derandomize_ms_vec,
    log_rm_max_cdf,
    random_match_threshold,
)

# reference: src/derandomize.rs:298-304
CDF_TABLE = [
    -1306319.1078024083, -318761.2492719044, -79220.9269610741,
    -19776.1823255263, -4942.2344281681, -1235.4454790664, -308.8543003470,
    -77.2131332649, -19.3032557026, -4.8258121998, -1.2064529421,
    -0.3016132288, -0.0754033068, -0.0188508267, -0.0047127067,
    -0.0011781767, -0.0002945442, -0.0000736360, -0.0000184090,
    -0.0000046023, -0.0000011506, -0.0000002876, -0.0000000719,
    -0.0000000180, -0.0000000045, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
]


def test_log_rm_max_cdf_table():
    for t in range(1, 32):
        assert log_rm_max_cdf(t, 4, 20240921) == pytest.approx(
            CDF_TABLE[t - 1], abs=1e-8
        )


def test_log_rm_max_cdf_doctest():
    # reference: src/derandomize.rs:69-80
    assert log_rm_max_cdf(10, 4, 20240921) == pytest.approx(
        -4.825812199808644, abs=1e-8
    )


def test_random_match_threshold():
    # reference: src/derandomize.rs:306-314
    expected = [15, 18, 22, 25, 28]
    for i in range(1, 6):
        assert random_match_threshold(31, 20240921, 4, 0.01**i) == expected[i - 1]


def test_random_match_threshold_doctest():
    # reference: src/derandomize.rs:115-126
    assert random_match_threshold(31, 20240921, 4, 0.01) == 15


@pytest.mark.parametrize(
    "curr,nxt,thr,k,expected",
    [
        (3, 3, 2, 3, 3),   # full match           (src/derandomize.rs:317-328)
        (2, -1, 2, 3, -2), # only noise           (src/derandomize.rs:330-342)
        (3, -1, 2, 3, 3),  # beginning of full    (src/derandomize.rs:344-356)
        (3, -1, 2, 4, 3),  # beginning of partial (src/derandomize.rs:358-370)
    ],
)
def test_derandomize_ms_val(curr, nxt, thr, k, expected):
    assert derandomize_ms_val(curr, nxt, thr, k) == expected


def test_derandomize_ms_vec():
    # reference: src/derandomize.rs:372-379 and doctest :257-267
    noisy = [1, 2, 2, 3, 2, 2, 3, 2, 1, 2, 3, 1, 1, 1, 2, 3, 1, 2]
    expected = [0, 1, 2, 3, 1, 2, 3, 0, 1, 2, 3, -1, 0, 1, 2, 3, -1, 0]
    got = derandomize_ms_vec(noisy, 3, 2)
    assert got.tolist() == expected
