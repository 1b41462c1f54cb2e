"""AES-128 (FIPS-197) + CBC mode, pure Python.

Used by the standard security handler (crypt.py) for /AESV2 crypt
filters (PDF 32000-1 §7.6.2: CBC with a random 16-byte IV prepended
to the ciphertext, PKCS#7-style padding). Table-driven byte
implementation — fast enough for the short strings and modest stream
payloads PDFs carry; the raster hot path is never encrypted-bound.
Built from the public FIPS-197 specification.
"""

from __future__ import annotations

from ..errors import UserError

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
_INV_SBOX = bytes(256)
_inv = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _inv[_v] = _i
_INV_SBOX = bytes(_inv)
del _inv, _i, _v

_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


#: GF(2^8) multiply tables for the mix-columns constants.
_MUL = {}
for _c in (2, 3, 9, 11, 13, 14):
    t = bytearray(256)
    for _x in range(256):
        r, a, b = 0, _x, _c
        while b:
            if b & 1:
                r ^= a
            a = _xtime(a)
            b >>= 1
        t[_x] = r
    _MUL[_c] = bytes(t)
del _c, _x, t


def expand_key(key: bytes) -> list[bytes]:
    """AES key schedule for 128- or 256-bit keys: 11 or 15 round keys."""

    if len(key) not in (16, 32):
        raise UserError(f"AES requires a 16- or 32-byte key, got {len(key)}.")
    nk = len(key) // 4
    nr = 10 if nk == 4 else 14
    words = [key[i:i + 4] for i in range(0, len(key), 4)]
    i = nk
    while len(words) < 4 * (nr + 1):
        w = words[-1]
        if i % nk == 0:
            w = bytes(
                (_SBOX[w[1]] ^ _RCON[i // nk - 1], _SBOX[w[2]], _SBOX[w[3]], _SBOX[w[0]])
            )
        elif nk == 8 and i % nk == 4:
            w = bytes(_SBOX[b] for b in w)
        w = bytes(a ^ b for a, b in zip(w, words[-nk]))
        words.append(w)
        i += 1
    return [b"".join(words[j:j + 4]) for j in range(0, 4 * (nr + 1), 4)]


def _encrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    s = bytearray(a ^ b for a, b in zip(block, rks[0]))
    m2, m3 = _MUL[2], _MUL[3]
    nr = len(rks) - 1
    for rnd in range(1, nr):
        # SubBytes + ShiftRows
        t = bytes(
            _SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)
        )
        # MixColumns + AddRoundKey
        rk = rks[rnd]
        for c in range(4):
            a0, a1, a2, a3 = t[4 * c:4 * c + 4]
            s[4 * c] = m2[a0] ^ m3[a1] ^ a2 ^ a3 ^ rk[4 * c]
            s[4 * c + 1] = a0 ^ m2[a1] ^ m3[a2] ^ a3 ^ rk[4 * c + 1]
            s[4 * c + 2] = a0 ^ a1 ^ m2[a2] ^ m3[a3] ^ rk[4 * c + 2]
            s[4 * c + 3] = m3[a0] ^ a1 ^ a2 ^ m2[a3] ^ rk[4 * c + 3]
    t = bytes(_SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16))
    return bytes(a ^ b for a, b in zip(t, rks[nr]))


def _decrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    nr = len(rks) - 1
    s = bytearray(a ^ b for a, b in zip(block, rks[nr]))
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows + InvSubBytes
        t = bytes(_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16))
        # AddRoundKey + InvMixColumns
        rk = rks[rnd]
        u = bytes(a ^ b for a, b in zip(t, rk))
        for c in range(4):
            a0, a1, a2, a3 = u[4 * c:4 * c + 4]
            s[4 * c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
            s[4 * c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
            s[4 * c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
            s[4 * c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
    t = bytes(_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16))
    return bytes(a ^ b for a, b in zip(t, rks[0]))


def cbc_encrypt(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """AES-128-CBC with PKCS#7 padding; returns iv || ciphertext (the
    PDF wire format for AESV2 strings and streams)."""

    rks = expand_key(key)
    pad = 16 - (len(plaintext) % 16)
    data = plaintext + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(block, rks)
        out += prev
    return bytes(out)


def cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC without padding or IV prefix (data must be block-aligned) —
    the shape the AES-256 password KDF and /UE //OE wrapping use."""

    if len(data) % 16:
        raise UserError("CBC-nopad requires block-aligned data.")
    rks = expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(block, rks)
        out += prev
    return bytes(out)


def cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise UserError("CBC-nopad requires block-aligned data.")
    rks = expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(block, rks), prev))
        prev = block
    return bytes(out)


def cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of cbc_encrypt: data = iv || ciphertext, strips padding."""

    if len(data) < 32 or len(data) % 16:
        raise UserError("AES stream is not a whole number of blocks.")
    rks = expand_key(key)
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        block = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(block, rks), prev))
        prev = block
    pad = out[-1]
    if not (1 <= pad <= 16):
        raise UserError("Bad AES padding (wrong key or corrupt stream).")
    return bytes(out[:-pad])
