"""PDF standard security handler (ISO 32000-1 §7.6.3) — RC4 and AES-128
decryption for encrypted PDFs with an EMPTY USER PASSWORD.

Real CommonCrawl PDF shards contain RC4/AESV2 standard-security files
whose user password is empty (owner-password-only "permissions"
encryption): those are legally extractable and every serious PDF text
extractor opens them. This module implements the published algorithms:

* Algorithm 2 — file encryption key from the (empty) user password,
  /O, /P, and the first document ID, with the R≥3 50×MD5 stretch.
* Algorithms 4/5 — /U verification, which is how we PROVE the empty
  user password is correct before touching any content (wrong or
  non-empty-password files fail soft upstream: status='unsupported').
* Algorithm 1 — per-object keys (MD5 over key + objnum/gennum, plus the
  'sAlT' suffix for AESV2), RC4 or AES-128-CBC with the 16-byte
  prepended IV and PKCS#7 padding.

The ciphers are pure-Python implementations of the public algorithms
(RC4; AES-128 per FIPS-197, validated in tests against the FIPS-197
appendix vectors) — no crypto library ships in this container, and the
data volumes are tiny (one content stream per fixture page). Both
directions are implemented: decrypt for the reader, encrypt so
``webx.pdf.write_pdf_encrypted`` can build deterministic encrypted
fixtures whose extraction must stay byte-identical to the plaintext
writer's.

Reference analog: the reference pipeline decodes every supported input
container up front (mindocr/data/transforms/general_transforms.py:35-53
decodes real image buffers); an encrypted PDF is the same story — a
container layer to undo before extraction, never a reason to lose rows.
"""

from __future__ import annotations

import functools as _functools
import hashlib
import struct
from typing import Optional

_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


# ------------------------------------------------------------------- RC4


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ------------------------------------------------------- AES-128 (FIPS-197)

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)
_RCON = b"\x01\x02\x04\x08\x10\x20\x40\x80\x1b\x36"


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


# Precomputed GF(2^8) multiplication tables for the MixColumns
# coefficients — the generic _mul loop dominated the profile (4 calls
# per output byte); a 256-entry lookup per coefficient removes it.
_MUL_T = {c: tuple(_mul(x, c) for x in range(256)) for c in (1, 2, 3, 9, 11, 13, 14)}


def _expand_key(key: bytes):
    """AES-128 key schedule → 11 round keys of 16 bytes."""
    w = [key[i : i + 4] for i in range(0, 16, 4)]
    for r in range(10):
        t = w[-1]
        t = bytes(
            (_SBOX[t[1]] ^ _RCON[r], _SBOX[t[2]], _SBOX[t[3]], _SBOX[t[0]])
        )
        for _ in range(4):
            t = bytes(x ^ y for x, y in zip(w[-4], t))
            w.append(t)
            t = w[-1]
    return [b"".join(w[i : i + 4]) for i in range(0, 44, 4)]


def _add_round_key(s: bytearray, rk: bytes) -> None:
    for i in range(16):
        s[i] ^= rk[i]


def _sub_shift(s: bytearray, box: bytes, inv: bool) -> bytearray:
    # combined SubBytes + ShiftRows (or their inverses): state is
    # column-major (s[r + 4c]); row r rotates left (fwd) / right (inv) by r
    out = bytearray(16)
    for c in range(4):
        for r in range(4):
            src_c = (c + r) % 4 if not inv else (c - r) % 4
            out[r + 4 * c] = box[s[r + 4 * src_c]]
    return out


def _mix_columns(s: bytearray, inv: bool) -> bytearray:
    out = bytearray(16)
    m = (14, 11, 13, 9) if inv else (2, 3, 1, 1)
    t0, t1, t2, t3 = (_MUL_T[m[0]], _MUL_T[m[1]], _MUL_T[m[2]], _MUL_T[m[3]])
    for c in range(4):
        o = 4 * c
        a, b_, cc, d = s[o], s[o + 1], s[o + 2], s[o + 3]
        out[o] = t0[a] ^ t1[b_] ^ t2[cc] ^ t3[d]
        out[o + 1] = t3[a] ^ t0[b_] ^ t1[cc] ^ t2[d]
        out[o + 2] = t2[a] ^ t3[b_] ^ t0[cc] ^ t1[d]
        out[o + 3] = t1[a] ^ t2[b_] ^ t3[cc] ^ t0[d]
    return out


def aes128_encrypt_block(key: bytes, block: bytes, rks=None) -> bytes:
    rks = rks or _expand_key(key)
    s = bytearray(block)
    _add_round_key(s, rks[0])
    for r in range(1, 10):
        s = _sub_shift(s, _SBOX, inv=False)
        s = _mix_columns(s, inv=False)
        _add_round_key(s, rks[r])
    s = _sub_shift(s, _SBOX, inv=False)
    _add_round_key(s, rks[10])
    return bytes(s)


def aes128_decrypt_block(key: bytes, block: bytes, rks=None) -> bytes:
    rks = rks or _expand_key(key)
    s = bytearray(block)
    _add_round_key(s, rks[10])
    for r in range(9, 0, -1):
        s = _sub_shift(s, _INV_SBOX, inv=True)
        _add_round_key(s, rks[r])
        s = _mix_columns(s, inv=True)
    s = _sub_shift(s, _INV_SBOX, inv=True)
    _add_round_key(s, rks[0])
    return bytes(s)


def aes_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    """PKCS#7-pad then CBC-encrypt; returns iv + ciphertext (the PDF
    stream layout: the IV is the first 16 bytes of the encrypted data)."""
    pad = 16 - (len(data) % 16)
    data = data + bytes([pad]) * pad
    out = [iv]
    prev = iv
    rks = _expand_key(key)  # once per message, not per block
    for i in range(0, len(data), 16):
        blk = bytes(x ^ y for x, y in zip(data[i : i + 16], prev))
        prev = aes128_encrypt_block(key, blk, rks)
        out.append(prev)
    return b"".join(out)


def aes_cbc_decrypt(key: bytes, iv_and_data: bytes) -> bytes:
    """CBC-decrypt data whose first 16 bytes are the IV; strips PKCS#7
    padding. Malformed input (bad length / bad padding) raises
    ValueError — callers fail soft."""
    if len(iv_and_data) < 32 or len(iv_and_data) % 16:
        raise ValueError("bad AES-CBC data length")
    iv, data = iv_and_data[:16], iv_and_data[16:]
    out = bytearray()
    prev = iv
    rks = _expand_key(key)  # once per message, not per block
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        dec = aes128_decrypt_block(key, blk, rks)
        out.extend(x ^ y for x, y in zip(dec, prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytearray([pad]) * pad:
        raise ValueError("bad PKCS#7 padding")
    return bytes(out[:-pad])


# --------------------------------------------------- standard handler


class UnsupportedEncryption(ValueError):
    pass


class StandardSecurityHandler:
    """ISO 32000-1 standard security handler, empty-user-password only.

    ``method`` is 'rc4' or 'aesv2'; ``r`` ∈ {2, 3, 4}; ``key_bytes`` is
    /Length in bytes (5 for 40-bit R2, typically 16 for R3/R4)."""

    def __init__(self, o: bytes, p: int, id0: bytes, r: int,
                 key_bytes: int, method: str, encrypt_metadata: bool = True):
        if method not in ("rc4", "aesv2"):
            raise UnsupportedEncryption(f"unsupported cipher {method!r}")
        if r not in (2, 3, 4):
            raise UnsupportedEncryption(f"unsupported revision R={r}")
        self.o = (o + _PAD)[:32]
        self.p = p
        self.id0 = id0
        self.r = r
        self.key_bytes = 5 if r == 2 else key_bytes
        self.method = method
        self.encrypt_metadata = encrypt_metadata
        self.key = self._file_key(b"")  # the empty user password

    # -- Algorithm 2: file encryption key
    def _file_key(self, user_pwd: bytes) -> bytes:
        h = hashlib.md5((user_pwd + _PAD)[:32])
        h.update(self.o)
        h.update(struct.pack("<I", self.p & 0xFFFFFFFF))  # low 32 bits, LE
        h.update(self.id0)
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[: self.key_bytes]).digest()
        return key[: self.key_bytes]

    # -- Algorithms 4/5: the /U entry for the empty user password
    def compute_u(self) -> bytes:
        if self.r == 2:
            return rc4(self.key, _PAD)
        h = hashlib.md5(_PAD)
        h.update(self.id0)
        u = rc4(self.key, h.digest())
        for i in range(1, 20):
            u = rc4(bytes(b ^ i for b in self.key), u)
        return u + b"\x00" * 16  # arbitrary 16-byte pad per spec

    def verify_empty_user_password(self, u: bytes) -> bool:
        mine = self.compute_u()
        n = 32 if self.r == 2 else 16  # R≥3 compares the first 16 bytes
        return mine[:n] == (u + b"\x00" * 32)[:n]

    # -- Algorithm 3: the /O entry (writer side; both passwords empty).
    # Memoized: fixture writers call it once per document with constant
    # arguments, and the 20-pass RC4 chain dominated their profile.
    @classmethod
    @_functools.lru_cache(maxsize=64)
    def compute_o(cls, r: int, key_bytes: int,
                  owner_pwd: bytes = b"", user_pwd: bytes = b"") -> bytes:
        key = hashlib.md5((owner_pwd + _PAD)[:32]).digest()
        if r >= 3:
            for _ in range(50):
                key = hashlib.md5(key).digest()
        key = key[: (5 if r == 2 else key_bytes)]
        o = rc4(key, (user_pwd + _PAD)[:32])
        if r >= 3:
            for i in range(1, 20):
                o = rc4(bytes(b ^ i for b in key), o)
        return o

    # -- Algorithm 1: per-object encryption
    def _obj_key(self, num: int, gen: int) -> bytes:
        h = hashlib.md5(
            self.key
            + (num & 0xFFFFFF).to_bytes(3, "little")
            + (gen & 0xFFFF).to_bytes(2, "little")
            + (b"sAlT" if self.method == "aesv2" else b"")
        )
        return h.digest()[: min(self.key_bytes + 5, 16)]

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        if self.method == "aesv2":
            return aes_cbc_decrypt(self._obj_key(num, gen), data)
        return rc4(self._obj_key(num, gen), data)

    def encrypt(self, num: int, gen: int, data: bytes,
                iv: Optional[bytes] = None) -> bytes:
        if self.method == "aesv2":
            if iv is None:
                # deterministic fixture IV: derived, not random
                iv = hashlib.md5(b"webx-iv" + data[:64]).digest()
            return aes_cbc_encrypt(self._obj_key(num, gen), data, iv)
        return rc4(self._obj_key(num, gen), data)


def handler_from_encrypt_dict(enc: dict, id0: bytes,
                              deref) -> StandardSecurityHandler:
    """Build + password-verify a handler from a parsed /Encrypt dict
    (webx.pdf value model: names as ('name', x), strings as ('str', b)).
    Raises UnsupportedEncryption for any scheme outside RC4/AESV2
    standard security with an empty user password — the caller fails
    soft (status='unsupported'), never mis-decodes."""

    def val(v):
        v = deref(v)
        return v[1] if isinstance(v, tuple) and v and v[0] in ("name", "str") else v

    if val(enc.get("Filter")) != "Standard":
        raise UnsupportedEncryption("non-standard security filter")
    v = int(val(enc.get("V", 1)) or 1)
    r = int(val(enc.get("R", 2)) or 2)
    length_bits = int(val(enc.get("Length", 40)) or 40)
    method = "rc4"
    if v == 4:
        cf = deref(enc.get("CF")) or {}
        stmf = val(enc.get("StmF", ("name", "Identity")))
        strf = val(enc.get("StrF", ("name", "Identity")))
        if stmf != strf:
            raise UnsupportedEncryption("split StmF/StrF crypt filters")
        stdcf = deref(cf.get(stmf)) if stmf in cf else None
        cfm = val((stdcf or {}).get("CFM")) if stdcf else None
        if cfm == "AESV2":
            method = "aesv2"
            length_bits = int(val((stdcf or {}).get("Length", 16)) or 16) * 8
        elif cfm == "V2":
            method = "rc4"
        else:
            raise UnsupportedEncryption(f"unsupported CFM {cfm!r}")
    elif v not in (1, 2):
        raise UnsupportedEncryption(f"unsupported V={v} (AESV3/R6 not implemented)")
    o = val(enc.get("O"))
    u = val(enc.get("U"))
    p = int(val(enc.get("P", -1)))
    if not isinstance(o, (bytes, bytearray)) or not isinstance(u, (bytes, bytearray)):
        raise UnsupportedEncryption("missing /O or /U")
    em = val(enc.get("EncryptMetadata", True))
    h = StandardSecurityHandler(
        bytes(o), p, id0, r, max(length_bits // 8, 5), method,
        encrypt_metadata=bool(em),
    )
    if not h.verify_empty_user_password(bytes(u)):
        raise UnsupportedEncryption("user password is not empty")
    return h
