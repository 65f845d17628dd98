"""Encrypted-PDF support: the ISO 32000 standard security handler.

The crypto primitives are pinned by published spec vectors (FIPS-197
Appendix C for AES, the classic Key/Plaintext RC4 vector), so the
decrypt side is validated independently of this repo's own encryptor;
the handler itself is then exercised by encode_pdf(encrypt=...)
round-trips for every supported revision.
"""

import pytest

from ai_invoice_ocr_engine_spark.pdf import PdfDocument, encode_pdf, pdf_spans
from ai_invoice_ocr_engine_spark.pdfcrypt import (
    AES,
    StandardSecurityHandler,
    _owner_o_value,
    _r34_file_key,
    _r34_user_check_bytes,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    hash_2b,
    rc4,
)

PAGES = [
    [("text", 72, 700, 14, "INVOICE 42"), ("text", 72, 680, 10, "Total: 99.50")],
    [("text", 72, 700, 12, "Page two line")],
]


# -- primitives vs published vectors ----------------------------------------


def test_aes_fips197_vectors():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = [
        ("000102030405060708090a0b0c0d0e0f",
         "69c4e0d86a7b0430d8cdb78070b4c55a"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617",
         "dda97ca4864cdfe06eaf70a0ec0d7191"),
        ("000102030405060708090a0b0c0d0e0f"
         "101112131415161718191a1b1c1d1e1f",
         "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key_hex, ct_hex in cases:
        a = AES(bytes.fromhex(key_hex))
        assert a.encrypt_block(pt).hex() == ct_hex
        assert a.decrypt_block(bytes.fromhex(ct_hex)) == pt


def test_rc4_classic_vector():
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    # RC4 is its own inverse
    assert rc4(b"Key", rc4(b"Key", b"payload bytes")) == b"payload bytes"


def test_aes_cbc_roundtrip_and_chaining():
    key = bytes(range(32))
    iv = bytes(range(16, 32))
    data = bytes(range(256)) * 2
    ct = aes_cbc_encrypt(key, iv, data)
    assert aes_cbc_decrypt(key, iv, ct) == data
    # chaining: flipping one ciphertext block corrupts exactly two
    # plaintext blocks
    bad = bytearray(ct)
    bad[16] ^= 1
    pt = aes_cbc_decrypt(key, iv, bytes(bad))
    assert pt[:16] == data[:16] and pt[48:] == data[48:]
    assert pt[16:48] != data[16:48]


def test_hash_2b_shape_and_stability():
    h1 = hash_2b(b"", b"12345678")
    h2 = hash_2b(b"", b"12345678")
    assert h1 == h2 and len(h1) == 32
    assert hash_2b(b"", b"87654321") != h1
    assert hash_2b(b"pw", b"12345678", b"u" * 48) != h1


# -- full-file round trips ----------------------------------------------------


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aesv2", "aesv3"])
@pytest.mark.parametrize("use_objstm", [False, True])
def test_encrypted_pdf_spans_match_plain(mode, use_objstm):
    want = pdf_spans(encode_pdf(PAGES))
    data = encode_pdf(PAGES, use_objstm=use_objstm, encrypt=mode)
    assert pdf_spans(data) == want
    # the file really is ciphered: plaintext must not appear raw
    assert b"INVOICE 42" not in data


def test_encrypted_pdf_with_image_xobject():
    import numpy as np

    img = (np.arange(64 * 48, dtype=np.uint8) % 251).reshape(48, 64)
    pages = [[("text", 72, 700, 12, "With image"),
              ("image", 100, 300, 128, 96, img, "gray")]]
    want = pdf_spans(encode_pdf(pages))
    got = pdf_spans(encode_pdf(pages, encrypt="aesv2"))
    assert got == want


# -- password-protected files stay loud seams --------------------------------


def _r4_enc_dict(user_pwd: bytes) -> dict:
    o = _owner_o_value(b"", user_pwd, 4, 16)
    key = _r34_file_key(user_pwd, o, -4, b"id", 4, 16, True)
    u = _r34_user_check_bytes(key, b"id", 4)
    return {"Filter": "Standard", "V": 4, "R": 4, "Length": 128, "P": -4,
            "CF": {"StdCF": {"CFM": "AESV2"}}, "StmF": "StdCF",
            "StrF": "StdCF", "O": o, "U": u}


def test_nonempty_user_password_is_loud():
    with pytest.raises(NotImplementedError, match="password-protected"):
        StandardSecurityHandler(_r4_enc_dict(b"secret"), b"id")
    # empty user password on the same structure opens fine
    StandardSecurityHandler(_r4_enc_dict(b""), b"id")


def test_r6_nonempty_user_password_is_loud():
    vsalt, ksalt = b"vvvvvvvv", b"kkkkkkkk"
    u = hash_2b(b"secret", vsalt) + vsalt + ksalt
    ue = aes_cbc_encrypt(hash_2b(b"secret", ksalt), b"\x00" * 16, bytes(32))
    enc = {"Filter": "Standard", "V": 5, "R": 6, "Length": 256, "P": -4,
           "CF": {"StdCF": {"CFM": "AESV3"}}, "StmF": "StdCF",
           "StrF": "StdCF", "O": b"\x00" * 48, "U": u, "UE": ue}
    with pytest.raises(NotImplementedError, match="password-protected"):
        StandardSecurityHandler(enc, b"")


def test_pubkey_handler_is_loud():
    with pytest.raises(NotImplementedError, match="security handler"):
        StandardSecurityHandler({"Filter": "Adobe.PubSec", "V": 4}, b"")


def test_password_protected_file_routes_to_ingest_error_contract():
    """A protected file raises through PdfDocument with the same
    (ValueError|NotImplementedError) contract ingest_pdfs catches."""
    data = encode_pdf(PAGES, encrypt="rc4-128")
    # splice in a wrong /U so the empty-password check fails
    doc = PdfDocument(data)  # sanity: pristine file opens
    assert doc._crypt is not None
    broken = data.replace(b"/U <", b"/U <ff", 1)
    with pytest.raises(NotImplementedError, match="password-protected"):
        pdf_spans(broken)


# --------------------------------------------------------------------------
# Password-protected files open with the supplied secret (user OR owner)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aesv2", "aesv3"])
def test_protected_pdf_opens_with_user_password(mode):
    data = encode_pdf(PAGES, encrypt=mode, user_pwd=b"hunter2",
                      owner_pwd=b"admin")
    with pytest.raises(NotImplementedError, match="password"):
        pdf_spans(data)  # no password: loud
    spans, _media = pdf_spans(data, password=b"hunter2")
    assert any(s["kind"] == "text" and s["text"] for s in spans)


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aesv2", "aesv3"])
def test_protected_pdf_opens_with_owner_password(mode):
    """Algorithm 7 (R2-R4): the owner key decrypts /O back into the padded
    user password; R6 hashes the owner salts + U48 and unwraps /OE."""
    data = encode_pdf(PAGES, encrypt=mode, user_pwd=b"hunter2",
                      owner_pwd=b"admin")
    spans, _media = pdf_spans(data, password=b"admin")
    assert any(s["kind"] == "text" and s["text"] for s in spans)
    with pytest.raises(NotImplementedError, match="password"):
        pdf_spans(data, password=b"wrong-secret")


def test_owner_locked_still_opens_with_any_or_no_password():
    """The historical empty-user-password layout keeps working, and a
    supplied password that happens to be the owner's also opens it."""
    data = encode_pdf(PAGES, encrypt="aesv2", owner_pwd=b"admin")
    s1, _ = pdf_spans(data)
    s2, _ = pdf_spans(data, password=b"admin")
    assert s1 == s2
