"""CRC matmul implementation vs naive GF(2) long division."""

import numpy as np
import pytest

from srsran_4g_tpu.ops import crc
from srsran_4g_tpu.utils.constants import CRC_POLYS


def crc_longdiv(bits: np.ndarray, poly_key: str) -> np.ndarray:
    poly, order = CRC_POLYS[poly_key]
    reg = 0
    for b in bits:
        reg = (reg << 1) | int(b)
        if reg >> order:
            reg ^= poly
    # flush with `order` zeros
    for _ in range(order):
        reg <<= 1
        if reg >> order:
            reg ^= poly
    return ((reg >> np.arange(order - 1, -1, -1)) & 1).astype(np.uint8)


@pytest.mark.parametrize("poly_key", ["24A", "24B", "16", "8"])
@pytest.mark.parametrize("n", [8, 40, 137])
def test_crc_np_matches_longdiv(poly_key, n):
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=n).astype(np.uint8)
    np.testing.assert_array_equal(crc.crc_np(bits, poly_key), crc_longdiv(bits, poly_key))


def test_crc_device_check():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(4, 100)).astype(np.uint8)
    with_crc = crc.crc_attach_np(bits, "24A")
    ok = np.asarray(crc.crc_check(with_crc, "24A"))
    assert ok.all()
    corrupted = with_crc.copy()
    corrupted[:, 17] ^= 1
    assert not np.asarray(crc.crc_check(corrupted, "24A")).any()
    # device compute matches host
    dev = np.asarray(crc.crc_compute(bits, "24A"))
    np.testing.assert_array_equal(dev, crc.crc_np(bits, "24A"))


def test_crc_known_vector():
    # CRC16-CCITT (poly 0x1021, init 0) of ASCII "123456789" is 0x31C3.
    data = np.unpackbits(np.frombuffer(b"123456789", dtype=np.uint8))
    out = crc.crc_np(data, "16")
    val = int("".join(map(str, out)), 2)
    assert val == 0x31C3
