"""Security tests against 3GPP conformance vectors
(reference: lib/test/common/test_eea2/test_eia2, TS 35.207 test sets)."""

import pytest

from srsran_4g_tpu.stack import security as S


def h(s):
    return bytes.fromhex(s)


def test_milenage_ts35207_set1():
    k = h("465b5ce8b199b49faa5f0a2ee238a6bc")
    rand = h("23553cbe9637a89d218ae64dae47bf35")
    sqn = h("ff9bb4d0b607")
    amf = h("b9b9")
    op = h("cdc202d5123e20f62b6d676ac72cb318")
    opc = S.opc_from_op(k, op)
    assert opc == h("cd63cb71954a9f4e48a5994e37a02baf")
    mac_a, xres, ck, ik, ak = S.milenage(k, opc, rand, sqn, amf)
    assert mac_a == h("4a9ffac354dfafb3")
    assert xres == h("a54211d5e3ba50bf")
    assert ck == h("b40ba9a3c58b2a05bbf0d987b21bf8cb")
    assert ik == h("f769bcd751044604127672711c6d3441")
    assert ak == h("aa689c648370")


def test_eea2_ts33401_testset1():
    # TS 33.401 C.1 128-EEA2 Test Set 1
    key = h("d3c5d592327fb11c4035c6680af8c6d1")
    count = 0x398A59B4
    bearer = 0x15
    direction = 1
    plain = h("981ba6824c1bfb1ab485472029b71d808ce33e2cc3c0b5fc1f3de8a6dc66b1f0")
    out = S.eea2(key, count, bearer, direction, plain)
    expect = h("e9fed8a63d155304d71df20bf3e82214b20ed7dad2f233dc3c22d7bdeeed8e78")
    assert out == expect
    # symmetric
    assert S.eea2(key, count, bearer, direction, out) == plain


def test_eia2_properties():
    """EIA2 = AES-CMAC over COUNT|BEARER|DIR|message (TS 33.401 B.2.3).

    The CMAC core comes from the `cryptography` library (NIST-validated);
    this checks the LTE input framing: 4-byte MAC, deterministic, and
    sensitive to every framing field.
    """
    key = h("d3419be821087acd02123a9248033359")
    base = S.eia2(key, 0x398A59B4, 0x1A, 1, b"hello")
    assert len(base) == 4
    assert base == S.eia2(key, 0x398A59B4, 0x1A, 1, b"hello")
    assert base != S.eia2(key, 0x398A59B5, 0x1A, 1, b"hello")
    assert base != S.eia2(key, 0x398A59B4, 0x19, 1, b"hello")
    assert base != S.eia2(key, 0x398A59B4, 0x1A, 0, b"hello")
    assert base != S.eia2(key, 0x398A59B4, 0x1A, 1, b"hellp")


def test_kdf_chain_runs():
    ck, ik = bytes(16), bytes(range(16))
    ka = S.k_asme(ck, ik, h("02f839"), h("000000000001"))
    ke = S.k_enb(ka, 7)
    kup = S.k_rrc_up(ke, 1, "up_enc")
    assert len(ka) == 32 and len(ke) == 32 and len(kup) == 16
    # deterministic
    assert ke == S.k_enb(ka, 7)
    assert ke != S.k_enb(ka, 8)
