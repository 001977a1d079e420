"""From-scratch GIF89a codec (LZW) — the THIRD real media format behind
`media.decode_media` (PNG and WAV are the first two), giving the VIDEO
leg of the multimodal pipeline a real container: animated GIFs are a
genuine frame sequence, so frame sampling, per-frame features, and
perceptual dedup demonstrably run over decoded frames of a real format
rather than a stand-in byte split.

Public-knowledge implementation of the CompuServe GIF89a specification
(the format and its LZW variant are fully documented in the public spec;
the Unisys LZW patents expired in 2004). Scope is the subset a
training-data pipeline actually stores, with everything else an explicit
ValueError (the poisoned-row contract shared with png.py/wav.py — a
decode error must surface, never silently wrong pixels):

  * global color table only (local tables raise),
  * full-logical-screen frames at (0, 0) (partial frames raise),
  * non-interlaced data (interlace raises),
  * any number of frames; graphic-control / comment / application
    extensions are skipped as the spec directs.

The LZW coder is the GIF variant: LSB-first bit packing inside ≤255-byte
sub-blocks, initial code size `min_code_size + 1`, CLEAR = 2^mcs,
END = CLEAR + 1, table capped at 4096 with the encoder emitting CLEAR on
overflow and the decoder mirroring the reset. The encoder is a real LZW
compressor (dictionary build, not the uncompressed-codes trick), and
`encode_gif` can inject an ignorable application extension — a DIFFERENT
byte encoding of the SAME frames — which is how the tests and the corpus
build re-encoded variants for container-invariance proofs.

Reference analog: none — this module belongs to the LLM-data-pipeline
mandate (multimodal columns over opaque binary payloads).
"""

from __future__ import annotations

import struct

_MAX_CODE = 4095  # 12-bit ceiling fixed by the GIF spec


class _BitWriter:
    """LSB-first bit accumulator (the GIF packing order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, size: int) -> None:
        self.cur |= code << self.nbits
        self.nbits += size
        while self.nbits >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur & 0xFF)
            self.cur, self.nbits = 0, 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def read(self, size: int) -> int:
        while self.nbits < size:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated before end code")
            self.cur |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        val = self.cur & ((1 << size) - 1)
        self.cur >>= size
        self.nbits -= size
        return val


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriter()
    code_size = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    bw.write(clear, code_size)
    w = b""
    for ch in indices:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        bw.write(table[w], code_size)
        if next_code <= _MAX_CODE:
            table[wc] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            bw.write(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = mcs + 1
        w = bytes([ch])
    if w:
        bw.write(table[w], code_size)
    bw.write(end, code_size)
    return bw.flush()


def _lzw_decode(data: bytes, mcs: int) -> bytes:
    if not 2 <= mcs <= 8:
        raise ValueError(f"invalid LZW min code size {mcs}")
    clear, end = 1 << mcs, (1 << mcs) + 1
    br = _BitReader(data)
    out = bytearray()
    table: list[bytes] = []
    code_size = mcs + 1
    prev: bytes | None = None
    while True:
        code = br.read(code_size)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = mcs + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if not table:
            raise ValueError("LZW data before any clear code")
        if prev is None:
            if code >= clear:
                raise ValueError(f"first LZW code {code} is not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        if prev is not None and len(table) <= _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _grayscale_palette(bits: int) -> bytes:
    n = 1 << bits
    pal = bytearray()
    for i in range(n):
        v = (i * 255) // (n - 1) if n > 1 else 0
        pal += bytes([v, v, v])
    return bytes(pal)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[bytes],
    width: int,
    height: int,
    color_bits: int = 4,
    delay_cs: int = 4,
    extra_app_ext: bytes | None = None,
) -> bytes:
    """Frames of palette-index bytes (each width*height long, values <
    2^color_bits) -> a GIF89a animation with a grayscale global color
    table. `extra_app_ext` injects an ignorable application extension
    (different bytes, identical frames — the re-encode variant)."""
    if not frames:
        raise ValueError("no frames")
    n_colors = 1 << color_bits
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame size does not match geometry")
        if max(f) >= n_colors:
            raise ValueError("palette index out of range")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | ((color_bits - 1) & 7))  # GCT present, 2^bits entries
    out += b"\x00\x00"  # background index, aspect
    out += _grayscale_palette(color_bits)
    if extra_app_ext is not None:
        out += b"\x21\xff"
        out += _sub_blocks(b"SPARKGIF1.0" + extra_app_ext)
    # NETSCAPE loop extension (standard for animations)
    out += b"\x21\xff" + _sub_blocks(b"NETSCAPE2.0\x01\x00\x00")
    mcs = max(2, color_bits)
    for f in frames:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(f, mcs))
    out.append(0x3B)
    return bytes(out)


def decode_gif(data: bytes) -> tuple[bytes, int, int, int]:
    """GIF bytes -> (concatenated frame index bytes, width, height,
    n_frames). Raises ValueError on corruption or unsupported variants
    (local color tables, interlace, partial frames)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    width, height = struct.unpack("<HH", data[6:10])
    if width < 1 or height < 1:
        raise ValueError("invalid logical screen size")
    flags = data[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (1 << ((flags & 7) + 1))
    frames = bytearray()
    n_frames = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated: no trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("truncated extension")
            pos += 1
            while True:
                if pos >= len(data):
                    raise ValueError("truncated extension sub-blocks")
                size = data[pos]
                pos += 1 + size
                if size == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        left, top, iw, ih = struct.unpack("<HHHH", data[pos : pos + 8])
        iflags = data[pos + 8]
        pos += 9
        if iflags & 0x80:
            raise ValueError("local color tables unsupported")
        if iflags & 0x40:
            raise ValueError("interlaced GIFs unsupported")
        if (left, top) != (0, 0) or (iw, ih) != (width, height):
            raise ValueError("partial-frame GIFs unsupported")
        if pos >= len(data):
            raise ValueError("truncated before LZW min code size")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("truncated image sub-blocks")
            size = data[pos]
            pos += 1
            if size == 0:
                break
            if pos + size > len(data):
                raise ValueError("truncated image data")
            lzw += data[pos : pos + size]
            pos += size
        pixels = _lzw_decode(bytes(lzw), mcs)
        if len(pixels) != width * height:
            raise ValueError(
                f"frame decoded to {len(pixels)} pixels, expected {width * height}"
            )
        frames += pixels
        n_frames += 1
    if n_frames == 0:
        raise ValueError("no image frames")
    return bytes(frames), width, height, n_frames
