"""Pure-Python animated GIF89a encoding (no Pillow/matplotlib needed).

Completes the real-bytes-without-optional-deps story (``sinks/tiff.py``,
``sinks/cdf.py``) for the viewer's animation export: palette-indexed
frames are LZW-compressed into a standards-conformant looping GIF that
any browser/viewer plays. The Pillow branch of
``tools/viewer.py::create_gif`` still renders prettier matplotlib
panels; this is the dependency-free path.

Includes a tiny value-map colormap (`colormap_rdylgn`) approximating the
reference viewer's RdYlGn rendering with linear red→yellow→green
interpolation, NaN → gray.
"""

from __future__ import annotations

import struct

import numpy as np

_NAN_INDEX = 255  # last palette slot reserved for NaN gray


def rdylgn_palette() -> bytes:
    """256-entry RGB palette: indices 0..254 interpolate red → yellow →
    green; index 255 is the NaN gray."""
    pal = bytearray()
    for i in range(255):
        t = i / 254.0
        if t < 0.5:
            u = t / 0.5  # red (215,48,39) -> yellow (254,224,139)
            rgb = (215 + u * (254 - 215), 48 + u * (224 - 48), 39 + u * (139 - 39))
        else:
            u = (t - 0.5) / 0.5  # yellow -> green (26,152,80)
            rgb = (254 + u * (26 - 254), 224 + u * (152 - 224), 139 + u * (80 - 139))
        pal += bytes(int(round(c)) for c in rgb)
    pal += bytes((128, 128, 128))  # NaN gray
    return bytes(pal)


def colormap_rdylgn(values: np.ndarray, vmin: float, vmax: float) -> np.ndarray:
    """Float array → palette indices (uint8); NaN → the gray slot."""
    v = np.asarray(values, dtype=np.float64)
    t = np.clip((v - vmin) / (vmax - vmin or 1.0), 0.0, 1.0)
    idx = np.where(np.isnan(v), _NAN_INDEX, np.round(t * 254)).astype(np.uint8)
    return idx


def _lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: variable-width codes (LSB-first bit packing),
    CLEAR/EOI codes, dictionary reset at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    def fresh_table():
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for byte in indices:
        trial = prefix + bytes([byte])
        if trial in table:
            prefix = trial
            continue
        emit(table[prefix], width)
        table[trial] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def encode_gif(frames: list[np.ndarray], palette: bytes | None = None,
               duration_ms: int = 500, loop: int = 0) -> bytes:
    """Encode (H, W) uint8 palette-index frames as an animated GIF89a.

    ``palette``: 768 bytes (256 RGB triples), default RdYlGn;
    ``loop``: 0 = forever (NETSCAPE extension).
    """
    if not frames:
        raise ValueError("need at least one frame")
    pal = palette if palette is not None else rdylgn_palette()
    if len(pal) != 768:
        raise ValueError(f"palette must be 768 bytes, got {len(pal)}")
    h, w = frames[0].shape
    out = bytearray()
    out += b"GIF89a"
    # logical screen: global color table, 8-bit color resolution, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += pal
    # NETSCAPE looping extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    delay = max(1, duration_ms // 10)  # GIF ticks are 1/100 s
    for frame in frames:
        arr = np.asarray(frame, dtype=np.uint8)
        if arr.shape != (h, w):
            raise ValueError(f"frame shape {arr.shape} != first frame {(h, w)}")
        # graphic control: no disposal tricks, just the delay
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # LZW min code size
        data = _lzw_encode(arr.tobytes())
        for i in range(0, len(data), 255):
            chunk = data[i: i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """Minimal decoder for GIFs written by :func:`encode_gif` (test aid):
    returns the palette-index frames."""
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    w, h, flags = struct.unpack_from("<HHB", data, 6)
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    frames = []
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:
            break
        if block == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            _, _, fw, fh, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 0x07))
            min_code = data[pos]
            pos += 1
            payload = bytearray()
            while data[pos] != 0:
                n = data[pos]
                payload += data[pos + 1: pos + 1 + n]
                pos += 1 + n
            pos += 1
            frames.append(
                np.frombuffer(
                    _lzw_decode(bytes(payload), min_code), dtype=np.uint8
                )[: fw * fh].reshape(fh, fw)
            )
        else:
            raise ValueError(f"unexpected block 0x{block:02x} at {pos}")
    return frames


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    bitpos = 0

    def read_code():
        nonlocal bitpos
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    reset()
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read_code()
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and code != clear:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)
