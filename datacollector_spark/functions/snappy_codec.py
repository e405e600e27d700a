"""Pure-Python Snappy codec (block + framing format).

The SDC RPC transport compresses request bodies with the Snappy framing
format (destination/sdcipc/SdcIpcTarget.java:148 `SnappyFramedOutputStream`,
origin/sdcipc/IpcServlet.java:104 `SnappyFramedInputStream(is, true)` —
checksums verified). No snappy library ships in this environment, so this
implements the two PUBLIC format specs directly (google/snappy
format_description.txt and framing_format.txt):

* block DEcompressor: full tag set (literal, copy1/2/4, overlapping copies);
* block compressor: literal-only emission — a spec-valid Snappy stream (the
  format permits any literal/copy mix; literal-only trades ratio for
  simplicity, exactly like a stored-block deflate stream);
* framed reader/writer: stream identifier, compressed (0x00) + uncompressed
  (0x01) chunks, masked CRC-32C verification, padding/skippable chunks.

The test suite pins the decoder against hand-assembled vectors that DO use
copy tags, so interop with a real compressor's output is exercised.
"""
from __future__ import annotations

import struct

_STREAM_IDENTIFIER = b"\xff\x06\x00\x00sNaPpY"
_MAX_CHUNK = 65536  # framing_format.txt: max uncompressed bytes per chunk


# ----------------------------------------------------------- CRC-32C (masked)
def _make_crc32c_table() -> list[int]:
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    """framing_format.txt §3: mask = rotr(crc, 15) + 0xa282ead8 (mod 2^32)."""
    crc = crc32c(data)
    return (((crc >> 15) | ((crc << 17) & 0xFFFFFFFF)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------------- block format
def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint overflow")


def _put_uvarint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def block_compress(data: bytes) -> bytes:
    """Literal-only Snappy block (valid per format_description.txt §2)."""
    out = bytearray(_put_uvarint(len(data)))
    pos = 0
    while pos < len(data) or (pos == 0 and not data):
        chunk = data[pos : pos + 0xFFFFFFFF]
        n = len(chunk)
        if n == 0:
            break
        if n <= 60:
            out.append((n - 1) << 2)
        elif n <= 0x100:
            out.append(60 << 2)
            out.append(n - 1)
        elif n <= 0x10000:
            out.append(61 << 2)
            out += struct.pack("<H", n - 1)
        elif n <= 0x1000000:
            out.append(62 << 2)
            out += struct.pack("<I", n - 1)[:3]
        else:
            out.append(63 << 2)
            out += struct.pack("<I", n - 1)
        out += chunk
        pos += n
    return bytes(out)


def block_decompress(buf: bytes) -> bytes:
    """Full block decoder: literals + copy1/copy2/copy4, overlap-safe."""
    expected, pos = _uvarint(buf, 0)
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            l = tag >> 2
            if l < 60:
                length = l + 1
            else:
                extra = l - 59  # 60→1, 61→2, 62→3, 63→4 bytes of length
                length = int.from_bytes(buf[pos : pos + extra], "little") + 1
                pos += extra
            out += buf[pos : pos + length]
            pos += length
            continue
        if kind == 1:  # copy with 1-byte offset tail
            length = 4 + ((tag >> 2) & 0x7)
            offset = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte LE offset
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
        else:  # copy, 4-byte LE offset
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: corrupt copy offset")
        if offset >= length:
            start = len(out) - offset
            out += out[start : start + length]
        else:  # overlapping copy: byte-at-a-time run extension
            for _ in range(length):
                out.append(out[-offset])
    if len(out) != expected:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, preamble declared {expected}"
        )
    return bytes(out)


# ------------------------------------------------------------ framing format
def framed_compress(data: bytes) -> bytes:
    out = bytearray(_STREAM_IDENTIFIER)
    for pos in range(0, max(len(data), 1), _MAX_CHUNK):
        chunk = data[pos : pos + _MAX_CHUNK]
        body = struct.pack("<I", masked_crc32c(chunk)) + block_compress(chunk)
        out.append(0x00)  # compressed-data chunk
        out += struct.pack("<I", len(body))[:3]
        out += body
    return bytes(out)


def framed_decompress(buf: bytes, verify_checksums: bool = True) -> bytes:
    if not buf.startswith(_STREAM_IDENTIFIER):
        raise ValueError("snappy framed: missing sNaPpY stream identifier")
    pos = len(_STREAM_IDENTIFIER)
    out = bytearray()
    while pos < len(buf):
        ctype = buf[pos]
        clen = int.from_bytes(buf[pos + 1 : pos + 4], "little")
        pos += 4
        body = buf[pos : pos + clen]
        if len(body) != clen:
            raise ValueError("snappy framed: truncated chunk")
        pos += clen
        if ctype == 0xFF:  # repeated stream identifier
            if body != _STREAM_IDENTIFIER[4:]:
                raise ValueError("snappy framed: bad stream identifier chunk")
            continue
        if ctype in (0x00, 0x01):
            crc = struct.unpack("<I", body[:4])[0]
            payload = body[4:]
            decoded = block_decompress(payload) if ctype == 0x00 else payload
            if len(decoded) > _MAX_CHUNK:
                raise ValueError("snappy framed: chunk exceeds 65536 bytes")
            if verify_checksums and masked_crc32c(decoded) != crc:
                raise ValueError("snappy framed: checksum mismatch")
            out += decoded
        elif ctype == 0xFE or 0x80 <= ctype <= 0xFD:
            continue  # padding / skippable
        else:
            raise ValueError(f"snappy framed: unskippable chunk 0x{ctype:02x}")
    return bytes(out)
