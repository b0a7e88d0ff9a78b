"""PDF standard security handler (webx/pdfcrypt.py + webx/pdf.py
integration): cipher correctness against published vectors, the
empty-user-password round trip for every supported variant, and the
fail-soft contract for anything outside the supported envelope."""

from __future__ import annotations

import pytest

from webx.pdf import parse_pdf, write_pdf, write_pdf_encrypted
from webx.pdfcrypt import (
    StandardSecurityHandler,
    UnsupportedEncryption,
    aes128_decrypt_block,
    aes128_encrypt_block,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    handler_from_encrypt_dict,
    rc4,
)

# ------------------------------------------------------------- ciphers


def test_aes128_fips197_vector():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = aes128_encrypt_block(key, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert aes128_decrypt_block(key, ct) == pt


def test_aes_cbc_roundtrip_all_lengths():
    key = b"0123456789abcdef"
    iv = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 64, 100):
        data = bytes(range(256))[:n] * 1
        assert aes_cbc_decrypt(key, aes_cbc_encrypt(key, data, iv)) == data


def test_aes_cbc_rejects_malformed():
    key = b"0123456789abcdef"
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, b"short")
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, bytes(33))  # not a block multiple
    # bad padding: decrypt random-looking blocks
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, bytes(48))


def test_rc4_vectors():
    # the classic published RC4 test vectors
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert rc4(b"Secret", b"Attack at dawn").hex() == "45a01f645fc35b383552544b9bf5"


def test_rc4_is_its_own_inverse():
    assert rc4(b"k" * 16, rc4(b"k" * 16, b"payload bytes")) == b"payload bytes"


# ----------------------------------------------------------- handler


def test_u_entry_verifies_for_empty_password_all_revisions():
    id0 = bytes(range(16))
    for r, n, method in ((2, 5, "rc4"), (3, 16, "rc4"), (4, 16, "aesv2")):
        o = StandardSecurityHandler.compute_o(r, n)
        h = StandardSecurityHandler(o, -44, id0, r, n, method)
        assert h.verify_empty_user_password(h.compute_u())


def test_nonempty_user_password_is_rejected():
    id0 = bytes(range(16))
    o = StandardSecurityHandler.compute_o(3, 16, user_pwd=b"hunter2")
    # /U computed for password "hunter2" by an imaginary writer
    writer = StandardSecurityHandler(o, -44, id0, 3, 16, "rc4")
    writer.key = writer._file_key(b"hunter2")
    u_for_pwd = writer.compute_u()
    reader = StandardSecurityHandler(o, -44, id0, 3, 16, "rc4")
    assert not reader.verify_empty_user_password(u_for_pwd)


def test_handler_rejects_unsupported_schemes():
    with pytest.raises(UnsupportedEncryption):
        StandardSecurityHandler(b"o" * 32, -1, b"", 6, 32, "rc4")  # R6/AESV3
    with pytest.raises(UnsupportedEncryption):
        StandardSecurityHandler(b"o" * 32, -1, b"", 4, 16, "aesv3")
    with pytest.raises(UnsupportedEncryption):
        handler_from_encrypt_dict(
            {"Filter": ("name", "MySecurity")}, b"", lambda v: v
        )


def test_per_object_keys_differ_by_object():
    o = StandardSecurityHandler.compute_o(3, 16)
    h = StandardSecurityHandler(o, -44, bytes(16), 3, 16, "rc4")
    a = h.decrypt(4, 0, b"x" * 24)
    b = h.decrypt(5, 0, b"x" * 24)
    assert a != b  # object number is salted into the key


# ----------------------------------------------- end-to-end extraction

TITLE, BODY = "Doc 42", "An encrypted page whose text must survive intact."


@pytest.mark.parametrize(
    "method,r", [("rc4", None), ("rc4", 2), ("aesv2", None)]
)
def test_encrypted_extraction_byte_identical_to_plaintext(method, r):
    plain = parse_pdf(write_pdf(TITLE, BODY))
    enc = parse_pdf(write_pdf_encrypted(TITLE, BODY, method, r))
    assert enc == plain
    assert enc[0] == TITLE + "\n" + BODY


def test_encrypted_pdf_is_actually_encrypted():
    import zlib

    for method in ("rc4", "aesv2"):
        raw = write_pdf_encrypted(TITLE, BODY, method)
        assert b"/Encrypt" in raw
        assert BODY.encode() not in raw  # not readable in the clear
        # nor merely compressed: the stream bytes do not inflate
        plain_stream = zlib.compress(
            b"BT /F1 12 Tf 72 720 Td (" + TITLE.encode() + b") Tj"
        )
        assert plain_stream[:8] not in raw


def test_unsupported_encryption_fails_soft_in_extract():
    # doctor the /Encrypt dict into an unsupported filter name: the
    # document must become status=unsupported, not garbage text
    raw = write_pdf_encrypted(TITLE, BODY, "rc4").replace(
        b"/Filter /Standard", b"/Filter /FooSec"
    )
    with pytest.raises(Exception):
        parse_pdf(raw)  # extract_pdf catches this → status='unsupported'


def test_nonempty_password_file_fails_soft():
    # forge a /U that does not verify for the empty password
    raw = write_pdf_encrypted(TITLE, BODY, "rc4")
    import re

    m = re.search(rb"/U <([0-9a-f]+)>", raw)
    forged = raw.replace(m.group(1), m.group(1)[::-1])
    with pytest.raises(Exception):
        parse_pdf(forged)


def test_unicode_bodies_roundtrip_encrypted():
    for method in ("rc4", "aesv2"):
        t, b = "Ünïcode £ß", "naïve café — em-dash and ©2026"
        assert parse_pdf(write_pdf_encrypted(t, b, method))[0] == t + "\n" + b


def test_encrypted_xrefstream_layout_byte_identical():
    # modern-writer form: content stream + ObjStm container encrypted,
    # XRef stream plain, /Encrypt as a plain classic object (ISO 32000
    # 7.5.8.2) — crypt must thread through the compressed-object loads
    from webx.pdf import write_pdf_xrefstream

    plain = parse_pdf(write_pdf(TITLE, BODY))
    for enc in ("rc4", "aesv2"):
        for pred in (1, 12):
            got = parse_pdf(
                write_pdf_xrefstream(TITLE, BODY, predictor=pred, encrypted=enc)
            )
            assert got == plain, (enc, pred)


def test_encrypted_xrefstream_objstm_is_ciphertext():
    import zlib

    from webx.pdf import write_pdf_xrefstream

    raw = write_pdf_xrefstream(TITLE, BODY, encrypted="aesv2")
    assert b"/Encrypt 8 0 R" in raw
    # the catalog text lives inside the ObjStm; it must not be readable
    # by inflating any byte range (the container is ciphertext)
    assert b"/Type /Catalog" not in raw
    ok = False
    for i in range(len(raw)):
        try:
            if b"/Type /Catalog" in zlib.decompress(raw[i:]):
                ok = True
                break
        except Exception:
            continue
    assert not ok
