"""Gold sequence parity vs a direct TS 36.211 §7.2 reference recurrence."""

import numpy as np
import pytest

from srsran_4g_tpu.ops import sequence


def gold_direct(c_init: int, length: int, nc: int = 1600) -> np.ndarray:
    n = nc + length + 31
    x1 = np.zeros(n, dtype=np.uint8)
    x2 = np.zeros(n, dtype=np.uint8)
    x1[0] = 1
    for i in range(31):
        x2[i] = (c_init >> i) & 1
    for i in range(n - 31):
        x1[i + 31] = x1[i + 3] ^ x1[i]
        x2[i + 31] = x2[i + 3] ^ x2[i + 2] ^ x2[i + 1] ^ x2[i]
    return (x1[nc:nc + length] ^ x2[nc:nc + length]).astype(np.uint8)


@pytest.mark.parametrize("c_init", [0, 1, 0x12345678 & 0x7FFFFFFF, 12345, 2**30 + 7])
def test_gold_np_matches_direct(c_init):
    ref = gold_direct(c_init, 300)
    got = sequence.gold_sequence_np(c_init, 300)
    np.testing.assert_array_equal(got, ref)


def test_gold_jax_matches_np():
    c_inits = np.array([0, 1, 9999, 2**28 + 3], dtype=np.uint32)
    got = np.asarray(sequence.gold_sequence(c_inits, 257))
    for i, ci in enumerate(c_inits):
        np.testing.assert_array_equal(got[i], sequence.gold_sequence_np(int(ci), 257))


def test_gold_jax_scalar():
    got = np.asarray(sequence.gold_sequence(np.uint32(4321), 100))
    np.testing.assert_array_equal(got, sequence.gold_sequence_np(4321, 100))
