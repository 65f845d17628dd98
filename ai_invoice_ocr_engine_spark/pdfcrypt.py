"""PDF standard security handler (ISO 32000-1 s7.6 / 32000-2 s7.6.4).

Opens the overwhelmingly common "owner-locked" encrypted invoice (EMPTY
user password — anyone can read, permissions nominally restricted) by
default, and PASSWORD-PROTECTED files when the caller supplies the
secret (tried as the user password, then as the owner password via
Algorithm 7 / the R5-R6 owner salts).  Supported: R2 (RC4-40), R3/R4
(RC4-128 and AES-128 CBC, crypt filters V2/AESV2), R5 and R6 (AES-256,
AESV3).  A protected file with NO (or a wrong) supplied password stays
a loud NotImplementedError seam.  Public-key (/Filter /Adobe.PubSec)
handlers likewise.

Crypto primitives are implemented here from the public specs (FIPS-197
AES, the well-known RC4 KSA/PRGA) and pinned by spec test vectors in
tests/test_pdfcrypt.py, so the decrypt side is NOT validated only
against this module's own encrypt side.

Reference parity note: the reference engine delegates PDF handling
entirely to external readers; this module exists because the brief's
extraction pipeline ingests raw PDFs (sources/ingest.py) and scanned
invoices are frequently distributed owner-locked.
"""

from __future__ import annotations

import hashlib
import struct

_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA0108"
    "2E2E00B6D0683E802F0CA9FE6453697A"
)  # ISO 32000-1 Algorithm 2 padding string


# -- RC4 (public KSA/PRGA) ---------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    kl = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % kl]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# -- AES (FIPS-197), byte-oriented -------------------------------------------


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse in GF(2^8) then the affine transform
    sbox = bytearray(256)
    p = q = 1
    first = True
    while first or p != 1:
        first = False
        # p *= 3 (generator), q /= 3 via repeated inverse table walk
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        q ^= q << 1
        q ^= q << 2
        q ^= q << 4
        q &= 0xFF
        if q & 0x80:
            q ^= 0x09
        x = q ^ ((q << 1) | (q >> 7)) ^ ((q << 2) | (q >> 6)) \
            ^ ((q << 3) | (q >> 5)) ^ ((q << 4) | (q >> 4))
        sbox[p] = (x ^ 0x63) & 0xFF
    sbox[0] = 0x63
    inv = bytearray(256)
    for i, v in enumerate(sbox):
        inv[v] = i
    return bytes(sbox), bytes(inv)


_SBOX, _INV_SBOX = _build_sbox()
_XTIME = bytes(((x << 1) ^ 0x1B) & 0xFF if x & 0x80 else (x << 1) for x in range(256))


def _gmul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a = _XTIME[a]
        b >>= 1
    return r


_MUL9 = bytes(_gmul(x, 9) for x in range(256))
_MUL11 = bytes(_gmul(x, 11) for x in range(256))
_MUL13 = bytes(_gmul(x, 13) for x in range(256))
_MUL14 = bytes(_gmul(x, 14) for x in range(256))


def _build_tenc():
    """Combined SubBytes+ShiftRows+MixColumns lookup words (the classic
    T-table formulation); pinned by the FIPS-197 vectors in tests."""
    t0, t1, t2, t3 = [], [], [], []
    for x in range(256):
        s = _SBOX[x]
        s2 = _XTIME[s]
        s3 = s2 ^ s
        t0.append((s2 << 24) | (s << 16) | (s << 8) | s3)
        t1.append((s3 << 24) | (s2 << 16) | (s << 8) | s)
        t2.append((s << 24) | (s3 << 16) | (s2 << 8) | s)
        t3.append((s << 24) | (s << 16) | (s3 << 8) | s2)
    return tuple(t0), tuple(t1), tuple(t2), tuple(t3)


_TE0, _TE1, _TE2, _TE3 = _build_tenc()


class AES:
    """AES-128/192/256 single-block cipher, state as a 16-byte list in
    column-major (FIPS-197) order."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise ValueError("AES key must be 16/24/32 bytes")
        nk = len(key) // 4
        self.nr = nk + 6
        w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
        rcon = 1
        for i in range(nk, 4 * (self.nr + 1)):
            t = list(w[i - 1])
            if i % nk == 0:
                t = [_SBOX[t[1]] ^ rcon, _SBOX[t[2]], _SBOX[t[3]], _SBOX[t[0]]]
                rcon = _XTIME[rcon]
            elif nk > 6 and i % nk == 4:
                t = [_SBOX[b] for b in t]
            w.append([a ^ b for a, b in zip(w[i - nk], t)])
        self.rk = [
            [b for c in range(4) for b in w[4 * r + c]]
            for r in range(self.nr + 1)
        ]
        # round keys as big-endian 32-bit column words for the T-table path
        self.rkw = [
            [int.from_bytes(bytes(rk[4 * j : 4 * j + 4]), "big") for j in range(4)]
            for rk in self.rk
        ]

    @staticmethod
    def _add(s, k):
        return [a ^ b for a, b in zip(s, k)]

    def encrypt_block(self, block: bytes) -> bytes:
        k = self.rkw[0]
        c0 = int.from_bytes(block[0:4], "big") ^ k[0]
        c1 = int.from_bytes(block[4:8], "big") ^ k[1]
        c2 = int.from_bytes(block[8:12], "big") ^ k[2]
        c3 = int.from_bytes(block[12:16], "big") ^ k[3]
        for rnd in range(1, self.nr):
            k = self.rkw[rnd]
            c0, c1, c2, c3 = (
                _TE0[c0 >> 24] ^ _TE1[(c1 >> 16) & 0xFF]
                ^ _TE2[(c2 >> 8) & 0xFF] ^ _TE3[c3 & 0xFF] ^ k[0],
                _TE0[c1 >> 24] ^ _TE1[(c2 >> 16) & 0xFF]
                ^ _TE2[(c3 >> 8) & 0xFF] ^ _TE3[c0 & 0xFF] ^ k[1],
                _TE0[c2 >> 24] ^ _TE1[(c3 >> 16) & 0xFF]
                ^ _TE2[(c0 >> 8) & 0xFF] ^ _TE3[c1 & 0xFF] ^ k[2],
                _TE0[c3 >> 24] ^ _TE1[(c0 >> 16) & 0xFF]
                ^ _TE2[(c1 >> 8) & 0xFF] ^ _TE3[c2 & 0xFF] ^ k[3],
            )
        k = self.rkw[self.nr]
        o0 = ((_SBOX[c0 >> 24] << 24) | (_SBOX[(c1 >> 16) & 0xFF] << 16)
              | (_SBOX[(c2 >> 8) & 0xFF] << 8) | _SBOX[c3 & 0xFF]) ^ k[0]
        o1 = ((_SBOX[c1 >> 24] << 24) | (_SBOX[(c2 >> 16) & 0xFF] << 16)
              | (_SBOX[(c3 >> 8) & 0xFF] << 8) | _SBOX[c0 & 0xFF]) ^ k[1]
        o2 = ((_SBOX[c2 >> 24] << 24) | (_SBOX[(c3 >> 16) & 0xFF] << 16)
              | (_SBOX[(c0 >> 8) & 0xFF] << 8) | _SBOX[c1 & 0xFF]) ^ k[2]
        o3 = ((_SBOX[c3 >> 24] << 24) | (_SBOX[(c0 >> 16) & 0xFF] << 16)
              | (_SBOX[(c1 >> 8) & 0xFF] << 8) | _SBOX[c2 & 0xFF]) ^ k[3]
        return (o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
                + o2.to_bytes(4, "big") + o3.to_bytes(4, "big"))

    def decrypt_block(self, block: bytes) -> bytes:
        s = self._add(list(block), self.rk[self.nr])
        for rnd in range(self.nr - 1, 0, -1):
            # inverse ShiftRows: row r rotates right by r
            s = [s[(i - 4 * (i % 4)) % 16] for i in range(16)]
            s = [_INV_SBOX[b] for b in s]
            s = self._add(s, self.rk[rnd])
            t = []
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
                t += [
                    _MUL14[a0] ^ _MUL11[a1] ^ _MUL13[a2] ^ _MUL9[a3],
                    _MUL9[a0] ^ _MUL14[a1] ^ _MUL11[a2] ^ _MUL13[a3],
                    _MUL13[a0] ^ _MUL9[a1] ^ _MUL14[a2] ^ _MUL11[a3],
                    _MUL11[a0] ^ _MUL13[a1] ^ _MUL9[a2] ^ _MUL14[a3],
                ]
            s = t
        s = [s[(i - 4 * (i % 4)) % 16] for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        return bytes(self._add(s, self.rk[0]))


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt WITHOUT padding (len(data) % 16 == 0 required)."""
    if len(data) % 16:
        raise ValueError("CBC data not block-aligned")
    a = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = a.encrypt_block(bytes(x ^ y for x, y in zip(data[i : i + 16], prev)))
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt WITHOUT padding removal."""
    if len(data) % 16:
        raise ValueError("CBC data not block-aligned")
    a = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(x ^ y for x, y in zip(a.decrypt_block(blk), prev))
        prev = blk
    return bytes(out)


def _pkcs7_pad(data: bytes) -> bytes:
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


def _pkcs7_strip(data: bytes) -> bytes:
    if not data:
        return data
    n = data[-1]
    if 1 <= n <= 16 and len(data) >= n and data.endswith(bytes([n]) * n):
        return data[:-n]
    raise ValueError("bad AES padding in encrypted PDF data")


# -- ISO 32000 Algorithm 2.B (R6 password hash) ------------------------------


import functools


@functools.lru_cache(maxsize=64)
def hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


# -- standard security handler ------------------------------------------------


def _pad_pwd(pwd: bytes) -> bytes:
    return (pwd + _PAD)[:32]


def _r34_file_key(pwd: bytes, o: bytes, p: int, id0: bytes, r: int,
                  nbytes: int, encrypt_metadata: bool) -> bytes:
    """ISO 32000-1 Algorithm 2: file encryption key for R2/R3/R4."""
    h = hashlib.md5(_pad_pwd(pwd) + o[:32] + struct.pack("<i", p) + id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()[:nbytes]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()[:nbytes]
    return key


def _r34_user_check_bytes(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / Algorithm 5 (R3/R4): the /U value."""
    if r == 2:
        return rc4(key, _PAD)
    u = rc4(key, hashlib.md5(_PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def _owner_o_value(owner_pwd: bytes, user_pwd: bytes, r: int, nbytes: int) -> bytes:
    """Algorithm 3: the /O value (needed by the fixture encryptor)."""
    tmp = hashlib.md5(_pad_pwd(owner_pwd or user_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            tmp = hashlib.md5(tmp).digest()
    rkey = tmp[:nbytes]
    o = rc4(rkey, _pad_pwd(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rkey), o)
    return o


class StandardSecurityHandler:
    """Decrypt-side handler for an /Encrypt dictionary.

    ``password`` (bytes) is tried first as the USER password, then as
    the OWNER password (ISO 32000-1 Algorithm 7: the RC4 key derived
    from the owner password decrypts /O back into the padded user
    password; R5/R6 hash the owner password with the owner salts + U48
    and unwrap /OE). The default empty password keeps the historical
    anyone-can-read behavior. Raises NotImplementedError for anything
    needing a secret we do not have (no/wrong password supplied,
    public-key handlers) or a crypt filter outside
    V2/AESV2/AESV3/Identity."""

    def __init__(self, enc: dict, id0: bytes, resolve=lambda x: x,
                 password: bytes = b""):
        g = lambda k, d=None: resolve(enc.get(k, d))  # noqa: E731
        if str(g("Filter", "Standard")) != "Standard":
            raise NotImplementedError(
                f"PDF security handler {g('Filter')!r} unsupported"
            )
        self.v = int(g("V", 0))
        self.r = int(g("R", 2))
        self.p = int(g("P", -1))
        self.encrypt_metadata = bool(g("EncryptMetadata", True))
        o = bytes(g("O", b""))
        u = bytes(g("U", b""))
        self.str_cfm = self.stm_cfm = {1: "V2", 2: "V2"}.get(self.v)
        if self.v in (4, 5):
            cf = g("CF", {}) or {}
            def cfm_of(name):
                name = str(resolve(name))
                if name == "Identity":
                    return "Identity"
                f = resolve(cf.get(name))
                if not isinstance(f, dict):
                    raise NotImplementedError(f"PDF crypt filter {name!r} undefined")
                return str(resolve(f.get("CFM", "Identity")))
            self.stm_cfm = cfm_of(g("StmF", "Identity"))
            self.str_cfm = cfm_of(g("StrF", "Identity"))
            for m in (self.stm_cfm, self.str_cfm):
                if m not in ("V2", "AESV2", "AESV3", "Identity"):
                    raise NotImplementedError(f"PDF crypt method {m!r} unsupported")
        elif self.v not in (1, 2):
            raise NotImplementedError(f"PDF encryption V={self.v} unsupported")

        if self.r in (2, 3, 4):
            nbytes = int(g("Length", 40)) // 8
            if self.r == 2:
                nbytes = 5
            if not 5 <= nbytes <= 16:
                raise ValueError("bad /Length in PDF Encrypt dict")
            n = 32 if self.r == 2 else 16

            def try_user(pwd: bytes):
                key = _r34_file_key(pwd, o, self.p, id0, self.r, nbytes,
                                    self.encrypt_metadata)
                want = _r34_user_check_bytes(key, id0, self.r)
                return key if want[:n] == u[:n] else None

            key = try_user(password)
            if key is None and password:
                # Algorithm 7: the owner-password RC4 key decrypts /O back
                # into the padded user password
                tmp = hashlib.md5(_pad_pwd(password)).digest()
                if self.r >= 3:
                    for _ in range(50):
                        tmp = hashlib.md5(tmp).digest()
                rkey = tmp[:nbytes]
                upwd = o[:32]
                if self.r == 2:
                    upwd = rc4(rkey, upwd)
                else:
                    for i in range(19, -1, -1):
                        upwd = rc4(bytes(b ^ i for b in rkey), upwd)
                key = try_user(upwd)
            if key is None:
                raise NotImplementedError(
                    "password-protected PDF (wrong or missing password)"
                )
            self.key = key
        elif self.r in (5, 6):
            ue = bytes(g("UE", b""))
            oe = bytes(g("OE", b""))
            vsalt, ksalt = u[32:40], u[40:48]
            if self.r == 5:  # deprecated Adobe AES-256 (single SHA-256)
                ok = hashlib.sha256(password + vsalt).digest() == u[:32]
                ikey = hashlib.sha256(password + ksalt).digest()
            else:  # ISO 32000-2 Algorithm 2.B
                ok = hash_2b(password, vsalt) == u[:32]
                ikey = hash_2b(password, ksalt)
            wrapped = ue[:32]
            if not ok and password:
                # owner variant: salts ride in /O, U48 joins the hash, the
                # file key unwraps from /OE
                ovs, oks = o[32:40], o[40:48]
                if self.r == 5:
                    ok = hashlib.sha256(
                        password + ovs + u[:48]).digest() == o[:32]
                    ikey = hashlib.sha256(password + oks + u[:48]).digest()
                else:
                    ok = hash_2b(password, ovs, u[:48]) == o[:32]
                    ikey = hash_2b(password, oks, u[:48])
                wrapped = oe[:32]
            if not ok:
                raise NotImplementedError(
                    "password-protected PDF (wrong or missing password)"
                )
            self.key = aes_cbc_decrypt(ikey, b"\x00" * 16, wrapped)
            perms = bytes(g("Perms", b""))
            if len(perms) == 16:
                pd = AES(self.key).decrypt_block(perms)
                if pd[9:12] != b"adb":
                    raise ValueError("PDF /Perms check failed (wrong file key)")
        else:
            raise NotImplementedError(f"PDF encryption R={self.r} unsupported")

    # -- per-object decryption ---------------------------------------

    def _obj_key(self, num: int, gen: int, aes: bool) -> bytes:
        if self.v >= 5:
            return self.key
        h = hashlib.md5(
            self.key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
            + (b"sAlT" if aes else b"")
        ).digest()
        return h[: min(len(self.key) + 5, 16)]

    def _apply(self, cfm: str, data: bytes, num: int, gen: int,
               encrypt: bool) -> bytes:
        if cfm == "Identity" or cfm is None:
            return data
        if cfm == "V2":
            return rc4(self._obj_key(num, gen, False), data)
        key = self._obj_key(num, gen, True)
        if encrypt:
            iv = hashlib.md5(
                b"iv" + num.to_bytes(4, "little") + gen.to_bytes(2, "little")
            ).digest()  # deterministic fixture IV; any IV is valid CBC
            return iv + aes_cbc_encrypt(key, iv, _pkcs7_pad(data))
        if len(data) < 16:
            raise ValueError("AES-encrypted PDF data shorter than its IV")
        body = data[16:]
        body = body[: len(body) - len(body) % 16]
        return _pkcs7_strip(aes_cbc_decrypt(key, data[:16], body))

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.str_cfm, data, num, gen, False)

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.stm_cfm, data, num, gen, False)

    def encrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        if self.str_cfm == "V2":
            return rc4(self._obj_key(num, gen, False), data)
        return self._apply(self.str_cfm, data, num, gen, True)

    def encrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        if self.stm_cfm == "V2":
            return rc4(self._obj_key(num, gen, False), data)
        return self._apply(self.stm_cfm, data, num, gen, True)


def make_encryptor(mode: str, id0: bytes, seed: int = 7,
                   user_pwd: bytes = b"", owner_pwd: bytes = b"",
                   ) -> tuple[bytes, "StandardSecurityHandler"]:
    """Fixture-side: build an /Encrypt dictionary body (``user_pwd`` /
    ``owner_pwd``, empty by default; all permissions) plus a handler whose
    encrypt_* methods produce bytes the decrypt side must open.  mode:
    'rc4-40' | 'rc4-128' | 'aesv2' | 'aesv3'."""
    p = -4  # all permission bits set except reserved zero bits
    opwd = owner_pwd or user_pwd
    rng = hashlib.sha256(b"pdfcrypt-fixture-%d" % seed).digest()
    if mode in ("rc4-40", "rc4-128"):
        r = 2 if mode == "rc4-40" else 3
        nbits = 40 if mode == "rc4-40" else 128
        o = _owner_o_value(opwd, user_pwd, r, nbits // 8)
        key = _r34_file_key(user_pwd, o, p, id0, r, nbits // 8, True)
        u = _r34_user_check_bytes(key, id0, r)
        body = (
            f"<< /Filter /Standard /V {1 if r == 2 else 2} /R {r} "
            f"/Length {nbits} /P {p} "
            f"/O <{o.hex()}> /U <{u.hex()}> >>"
        ).encode()
        enc = {"Filter": "Standard", "V": 1 if r == 2 else 2, "R": r,
               "Length": nbits, "P": p, "O": o, "U": u}
    elif mode == "aesv2":
        r = 4
        o = _owner_o_value(opwd, user_pwd, r, 16)
        key = _r34_file_key(user_pwd, o, p, id0, r, 16, True)
        u = _r34_user_check_bytes(key, id0, r)
        body = (
            f"<< /Filter /Standard /V 4 /R 4 /Length 128 /P {p} "
            f"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
            f"/StmF /StdCF /StrF /StdCF "
            f"/O <{o.hex()}> /U <{u.hex()}> >>"
        ).encode()
        enc = {"Filter": "Standard", "V": 4, "R": 4, "Length": 128, "P": p,
               "CF": {"StdCF": {"CFM": "AESV2"}}, "StmF": "StdCF",
               "StrF": "StdCF", "O": o, "U": u}
    elif mode == "aesv3":
        r = 6
        file_key = rng[:32]
        vsalt, ksalt = rng[:8], rng[8:16]
        u = hash_2b(user_pwd, vsalt) + vsalt + ksalt
        ue = aes_cbc_encrypt(hash_2b(user_pwd, ksalt), b"\x00" * 16, file_key)
        ovs, oks = rng[16:24], rng[24:32]
        o = hash_2b(opwd, ovs, u[:48]) + ovs + oks
        oe = aes_cbc_encrypt(hash_2b(opwd, oks, u[:48]), b"\x00" * 16, file_key)
        pblk = struct.pack("<i", p) + b"\xff\xff\xff\xffTadb" + rng[:4]
        perms = AES(file_key).encrypt_block(pblk)
        body = (
            f"<< /Filter /Standard /V 5 /R 6 /Length 256 /P {p} "
            f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            f"/StmF /StdCF /StrF /StdCF "
            f"/O <{o.hex()}> /U <{u.hex()}> /OE <{oe.hex()}> "
            f"/UE <{ue.hex()}> /Perms <{perms.hex()}> >>"
        ).encode()
        enc = {"Filter": "Standard", "V": 5, "R": 6, "Length": 256, "P": p,
               "CF": {"StdCF": {"CFM": "AESV3"}}, "StmF": "StdCF",
               "StrF": "StdCF", "O": o, "U": u, "OE": oe, "UE": ue,
               "Perms": perms}
    else:
        raise ValueError(f"unknown encryption mode {mode!r}")
    return body, StandardSecurityHandler(enc, id0, password=user_pwd)
