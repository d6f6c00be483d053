"""SNOW 3G (128-EEA1/EIA1) and ZUC (128-EEA3/EIA3) against 3GPP vectors.

Golden data: TS 33.401 Annex C / the UEA2-UIA2 and EEA3-EIA3 implementor's
test sets, as committed in the reference's
`lib/test/common/test_eea1.cc`, `test_eia1.cc`, `test_eea3.cc`,
`test_eia3.cc`.
"""

from srsran_4g_tpu.stack import security
from srsran_4g_tpu.stack.snow3g_zuc import eea1, eea3, eia1, eia3

# (key, count, bearer, direction, bit_len, plaintext, ciphertext)
EEA1_SETS = [
    ("d3c5d592327fb11c4035c6680af8c6d1", 0x398a59b4, 0x15, 1, 253,
     "981ba6824c1bfb1ab485472029b71d808ce33e2cc3c0b5fc1f3de8a6dc66b1f0",
     "5d5bfe75eb04f68ce0a12377ea00b37d47c6a0ba06309155086a859c4341b378"),
    # same vector at byte-aligned length: last byte differs (no bit mask)
    ("d3c5d592327fb11c4035c6680af8c6d1", 0x398a59b4, 0x15, 1, 256,
     "981ba6824c1bfb1ab485472029b71d808ce33e2cc3c0b5fc1f3de8a6dc66b1f0",
     "5d5bfe75eb04f68ce0a12377ea00b37d47c6a0ba06309155086a859c4341b37c"),
    ("2bd6459f82c440e0952c49104805ff48", 0xc675a64b, 0x0c, 1, 798,
     "7ec61272743bf1614726446a6c38ced166f6ca76eb5430044286346cef130f92"
     "922b03450d3a9975e5bd2ea0eb55ad8e1b199e3ec4316020e9a1b285e7627953"
     "59b7bdfd39bef4b2484583d5afe082aee638bf5fd5a606193901a08f4ab41aab"
     "9b134880",
     "3f67850714b8da69efb727ed7a6c0c50714ad736c4f5600006e3525be807c467"
     "c677ff864af45fba09c27cde38f87a1f84d59ab255408f2c7b82f9ead41a1fe6"
     "5eabebfbc1f3a4c56c9a26fcf7b3d66d0220ee4775bc58170a2b12f3431d11b3"
     "44d6e36c"),
    # 39-byte ciphertext (310 bits): compares on the ciphertext length
    ("0a8b6bd8d9b08b08d64e32d1817777fb", 0x544d49cd, 0x04, 0, 310,
     "fd40a41d370a1f65745095687d47ba1d36d2349e23f644392c8ea9c49d40c132"
     "71aff264d0f24800",
     "48148e5452a210c05f46bc80dc6f73495b02048c1b958b026102ca97280279a4"
     "c18d2ee308921c"),
]

# (key, count, bearer, direction, bit_len, msg, mac)
EIA1_SETS = [
    ("2bd6459f82c5b300952c49104881ff48", 0x38a6f056, 0x1f, 0, 88,
     "3332346263393861373479", "731f1165"),
    ("83fd23a244a74cf358da3019f1722635", 0x36af6144, 0x0f, 1, 768,
     "35c68716633c66fb750c266865d53c11ea05b1e9fa49c8398d48e1efa5909d39"
     "47902837f5ae96d5a05bc8d61ca8dbef1b13a4b4abfe4fb1006045b674bb5472"
     "9304c382be53a5af05556176f6eaa2ef1d05e4b083181ee674cda5a485f74d7a",
     "bba74492"),
]

EEA3_SETS = [
    ("173d14ba5003731d7a60049470f00a29", 0x66035492, 0x0f, 0, 193,
     "6cf65340735552ab0c9752fa6f9025fe0bd675d9005875b200000000",
     "a6c85fc66afb8533aafc2518dfe784940ee1e4b030238cc800000000"),
    ("e5bd3ea0eb55ade866c6ac58bd54302a", 0x56823, 0x18, 1, 800,
     "14a8ef693d678507bbe7270a7f67ff5006c3525b9807e467c4e56000ba338f5d"
     "429559036751822246c80d3b38f07f4be2d8ff5805f5132229bde93bbbdcaf38"
     "2bf1ee972fbf9977bada8945847a2a6c9ad34a667554e04d1f7fa2c33241bd8f"
     "01ba220d",
     "131d43e0dea1be5c5a1bfd971d852cbf712d7b4f57961fea3208afa8bca433f4"
     "56ad09c7417e58bc69cf8866d1353f74865e80781d202dfb3ecff7fcbc3b190f"
     "e82a204ed0e350fc0f6f2613b2f2bca6df5a473a57a4a00d985ebad880d6f238"
     "64a07b01"),
]

EIA3_SETS = [
    ("00000000000000000000000000000000", 0x0, 0x0, 0, 1,
     "00000000", "c8a9595e"),
    ("47054125561eb2dda94059da05097850", 0x561eb2dd, 0x14, 0, 90,
     "000000000000000000000000", "6719a088"),
    ("c9e6cec4607c72db000aefa88385ab0a", 0xa94059da, 0x0a, 1, 577,
     "983b41d47d780c9e1ad11d7eb70391b1de0b35da2dc62f83e7b78d6306ca0ea0"
     "7e941b7be91348f9fcb170e2217fecd97f9f68adb16e5d7d21e569d280ed775c"
     "ebde3f4093c5388100000000",
     "fae8ff0b"),
]


def test_eea1_vectors():
    for key, count, bearer, dirn, bits, pt, ct in EEA1_SETS:
        out = eea1(bytes.fromhex(key), count, bearer, dirn,
                   bytes.fromhex(pt), bits)
        nct = len(ct) // 2
        assert out[:nct].hex() == ct, f"EEA1 mismatch at bits={bits}"
        assert not any(out[nct:])
        # decryption is the same operation
        back = eea1(bytes.fromhex(key), count, bearer, dirn, out, bits)
        rem = bits % 8
        want = bytearray(bytes.fromhex(pt))
        if rem:
            want[bits // 8] &= (0xFF << (8 - rem)) & 0xFF
            for i in range(bits // 8 + 1, len(want)):
                want[i] = 0
        assert back == bytes(want)


def test_eia1_vectors():
    for key, count, bearer, dirn, bits, msg, mac in EIA1_SETS:
        out = eia1(bytes.fromhex(key), count, bearer, dirn,
                   bytes.fromhex(msg), bits)
        assert out.hex() == mac


def test_eea3_vectors():
    for key, count, bearer, dirn, bits, pt, ct in EEA3_SETS:
        out = eea3(bytes.fromhex(key), count, bearer, dirn,
                   bytes.fromhex(pt), bits)
        assert out.hex() == ct, f"EEA3 mismatch at bits={bits}"
        back = eea3(bytes.fromhex(key), count, bearer, dirn, out, bits)
        assert back == eea3(bytes.fromhex(key), count, bearer, dirn, out,
                            bits)  # deterministic
        assert back[:bits // 8] == bytes.fromhex(pt)[:bits // 8]


def test_eia3_vectors():
    for key, count, bearer, dirn, bits, msg, mac in EIA3_SETS:
        out = eia3(bytes.fromhex(key), count, bearer, dirn,
                   bytes.fromhex(msg), bits)
        assert out.hex() == mac


def test_dispatch_tables():
    key = bytes(range(16))
    data = b"hello pdcp world"
    for alg in (0, 1, 2, 3):
        ct = security.cipher(alg, key, 7, 3, 1, data)
        assert security.cipher(alg, key, 7, 3, 1, ct) == data
        if alg:
            assert ct != data
    for alg in (1, 2, 3):
        mac = security.integrity(alg, key, 7, 3, 1, data)
        assert len(mac) == 4
        assert security.integrity(alg, key, 7, 3, 1, data) == mac
        assert security.integrity(alg, key, 8, 3, 1, data) != mac


def test_pdcp_all_cipher_suites():
    """SRB round-trip (cipher + integrity) under every EEA/EIA pair."""
    from srsran_4g_tpu.stack.pdcp import PdcpConfig, PdcpEntity
    key_c, key_i = bytes(range(16)), bytes(range(16, 32))
    for alg in (1, 2, 3):
        tx = PdcpEntity(PdcpConfig(is_control=True, bearer_id=1,
                                   cipher_key=key_c, integrity_key=key_i,
                                   cipher_algo=alg, integrity_algo=alg))
        rx = PdcpEntity(PdcpConfig(is_control=True, bearer_id=1,
                                   cipher_key=key_c, integrity_key=key_i,
                                   cipher_algo=alg, integrity_algo=alg))
        msgs = [bytes([i]) * (i + 5) for i in range(4)]
        for m in msgs:
            rx.write_pdu(tx.write_sdu(m, direction=0), direction=0)
        assert rx.delivered == msgs
        assert rx.integrity_failures == 0
        # corrupt one byte -> integrity failure, SDU dropped
        pdu = bytearray(tx.write_sdu(b"payload", direction=0))
        pdu[-1] ^= 0xFF
        rx.write_pdu(bytes(pdu), direction=0)
        assert rx.integrity_failures == 1
