"""LTE security: ciphering, integrity, key derivation, Milenage AKA.

Counterpart of the reference's `lib/src/common/security.cc` /
`liblte_security.cc` (TS 33.401, 35.206): the AES-based algorithm set —
EEA0/EEA2 ciphering (AES-CTR), EIA2 integrity (AES-CMAC), the HMAC-SHA256
KDF family (K_ASME → K_eNB → K_RRCint/K_RRCenc/K_UPenc, NH chaining), and
Milenage f1-f5 for AKA vector generation (the HSS/USIM side).

SNOW3G (EEA1/EIA1) and ZUC (EEA3/EIA3) live in `snow3g_zuc.py`; the
`cipher()`/`integrity()` dispatchers below select by 33.401 algorithm id
(the reference's `cipher_algorithm_id_t`/`integrity_algorithm_id_t` in
`lib/include/srsran/common/security.h`).
"""

from __future__ import annotations

import hashlib
import hmac
import struct

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
from cryptography.hazmat.primitives.cmac import CMAC


# --- KDF family (TS 33.401 Annex A) ------------------------------------------


def _kdf(key: bytes, fc: int, *params: bytes) -> bytes:
    s = bytes([fc])
    for p in params:
        s += p + struct.pack(">H", len(p))
    return hmac.new(key, s, hashlib.sha256).digest()


def k_asme(ck: bytes, ik: bytes, plmn: bytes, sqn_xor_ak: bytes) -> bytes:
    return _kdf(ck + ik, 0x10, plmn, sqn_xor_ak)


def k_enb(k_asme_: bytes, ul_nas_count: int) -> bytes:
    return _kdf(k_asme_, 0x11, struct.pack(">I", ul_nas_count))


def nh(k_asme_: bytes, sync_input: bytes) -> bytes:
    """Next-hop key for vertical K_eNB* derivation at handover
    (33.401 A.4); the first NH chains from the initial K_eNB, later
    ones from the previous NH."""
    return _kdf(k_asme_, 0x12, sync_input)


def k_enb_star(key: bytes, pci: int, earfcn_dl: int = 3400) -> bytes:
    """K_eNB* bound to the target cell (33.401 A.5); `key` is NH for
    vertical derivation or the current K_eNB for horizontal."""
    return _kdf(key, 0x13, struct.pack(">H", pci),
                struct.pack(">I", earfcn_dl))


def s_kgnb(k_enb_: bytes, scg_counter: int) -> bytes:
    """EN-DC secondary-node key (33.401 Annex A.15): S-KgNB =
    KDF(K_eNB, FC=0x1C, SCG counter)."""
    return _kdf(k_enb_, 0x1C, struct.pack(">H", scg_counter))


def k_nas(k_asme_: bytes, alg_id: int, integrity: bool) -> bytes:
    dist = b"\x02" if integrity else b"\x01"
    return _kdf(k_asme_, 0x15, dist, bytes([alg_id]))[16:]


def k_rrc_up(k_enb_: bytes, alg_id: int, which: str) -> bytes:
    dist = {"rrc_enc": 3, "rrc_int": 4, "up_enc": 5, "up_int": 6}[which]
    return _kdf(k_enb_, 0x15, bytes([dist]), bytes([alg_id]))[16:]


def nh(k_asme_: bytes, sync_input: bytes) -> bytes:
    return _kdf(k_asme_, 0x12, sync_input)


# --- EEA2 / EIA2 (AES) -------------------------------------------------------


def _eea2_ctr(key: bytes, count: int, bearer: int, direction: int) -> bytes:
    return struct.pack(">IB11x", count & 0xFFFFFFFF, ((bearer & 0x1F) << 3)
                       | ((direction & 1) << 2))


def eea2(key: bytes, count: int, bearer: int, direction: int,
         data: bytes) -> bytes:
    """128-EEA2 ciphering (AES-128-CTR), symmetric."""
    iv = _eea2_ctr(key, count, bearer, direction)
    enc = Cipher(algorithms.AES(key), modes.CTR(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def eea0(key: bytes, count: int, bearer: int, direction: int,
         data: bytes) -> bytes:
    return data  # null ciphering


def eia2(key: bytes, count: int, bearer: int, direction: int,
         data: bytes) -> bytes:
    """128-EIA2 integrity (AES-128-CMAC) → 4-byte MAC-I."""
    m = struct.pack(">IB3x", count & 0xFFFFFFFF,
                    ((bearer & 0x1F) << 3) | ((direction & 1) << 2)) + data
    c = CMAC(algorithms.AES(key))
    c.update(m)
    return c.finalize()[:4]


# --- algorithm-id dispatch (33.401: 0=EEA0/EIA0, 1=SNOW3G, 2=AES, 3=ZUC) ------


def cipher(alg_id: int, key: bytes, count: int, bearer: int,
           direction: int, data: bytes) -> bytes:
    if alg_id == 0:
        return data
    if alg_id == 2:
        return eea2(key, count, bearer, direction, data)
    from srsran_4g_tpu.stack import snow3g_zuc
    fn = {1: snow3g_zuc.eea1, 3: snow3g_zuc.eea3}[alg_id]
    return fn(key, count, bearer, direction, data)


def integrity(alg_id: int, key: bytes, count: int, bearer: int,
              direction: int, data: bytes) -> bytes:
    if alg_id == 2:
        return eia2(key, count, bearer, direction, data)
    from srsran_4g_tpu.stack import snow3g_zuc
    fn = {1: snow3g_zuc.eia1, 3: snow3g_zuc.eia3}[alg_id]
    return fn(key, count, bearer, direction, data)


# --- Milenage (TS 35.206) ----------------------------------------------------


def _aes_enc(k: bytes, block: bytes) -> bytes:
    enc = Cipher(algorithms.AES(k), modes.ECB()).encryptor()
    return enc.update(block) + enc.finalize()


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def _rot(x: bytes, r_bits: int) -> bytes:
    r = r_bits // 8
    return x[r:] + x[:r]


def milenage(k: bytes, opc: bytes, rand: bytes, sqn: bytes, amf: bytes):
    """f1..f5: returns (mac_a, xres, ck, ik, ak)."""
    temp = _aes_enc(k, _xor(rand, opc))
    inp = sqn + amf + sqn + amf
    out1 = _xor(
        _aes_enc(k, _xor(_rot(_xor(inp, opc), 64), temp)), opc)
    mac_a = out1[:8]
    # f2/f5: OUT2 = E[rot(TEMP ^ OPc, r2) ^ c2]K ^ OPc, r2=0, c2=...0001
    c2 = bytes(15) + b"\x01"
    out2 = _xor(_aes_enc(k, _xor(_xor(temp, opc), c2)), opc)
    xres = out2[8:]
    ak = out2[:6]
    # f3: r3=32, c3=...0002
    c3 = bytes(15) + b"\x02"
    out3 = _xor(_aes_enc(k, _xor(_rot(_xor(temp, opc), 32), c3)), opc)
    ck = out3
    # f4: r4=64, c4=...0004
    c4 = bytes(15) + b"\x04"
    out4 = _xor(_aes_enc(k, _xor(_rot(_xor(temp, opc), 64), c4)), opc)
    ik = out4
    return mac_a, xres, ck, ik, ak


def opc_from_op(k: bytes, op: bytes) -> bytes:
    return _xor(_aes_enc(k, op), op)
