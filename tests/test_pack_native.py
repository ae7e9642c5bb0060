"""Native blocked packing: equality with the numpy path + input validation."""

import numpy as np
import pytest

from genome_downsampler_tpu.ops.pallas_blocked import pack_blocked


def test_native_matches_numpy_multisets():
    rng = np.random.default_rng(0)
    start = rng.integers(0, 100_000, 50_000)
    span = rng.integers(10, 200, 50_000)
    end = start + span - 1
    pn, cn, winn, npadn = pack_blocked(
        start, end, 100_000, 8, 256, 256, use_native=True
    )
    pf, cf, winf, npadf = pack_blocked(
        start, end, 100_000, 8, 256, 256, use_native=False
    )
    assert (winn, npadn) == (winf, npadf) and pn.shape == pf.shape
    np.testing.assert_array_equal(cn, cf)
    for t in range(pn.shape[0]):
        for w in range(8):
            np.testing.assert_array_equal(
                np.sort(pn[t, w][pn[t, w] >= 0]),
                np.sort(pf[t, w][pf[t, w] >= 0]),
            )


def test_native_rejects_out_of_range_start():
    # a start beyond the packed range must error, not corrupt the heap
    start = np.array([10, 10_000_000], np.int64)
    end = start + 99
    with pytest.raises(ValueError):
        pack_blocked(start, end, 100_000, 8, 256, 256, use_native=True)


def test_native_rejects_negative_start_and_bad_span():
    start = np.array([-5, 10], np.int64)
    end = start + 99
    with pytest.raises(ValueError):
        pack_blocked(start, end, 100_000, 8, 256, 256, use_native=True)
    start = np.array([10], np.int64)
    end = np.array([9], np.int64)  # span 0
    with pytest.raises(ValueError):
        pack_blocked(start, end, 100_000, 8, 256, 256, use_native=True)