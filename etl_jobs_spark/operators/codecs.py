"""Pure-stdlib media codecs: PNG, BMP, and PCM WAV.

The container ships no image/audio libraries (no PIL, no ffmpeg), but
three real container formats are decodable with nothing beyond the
standard library: PNG (zlib inflate + the five scanline filters), BMP
(24-bit uncompressed, struct), and WAV (PCM, the ``wave`` module).
These codecs upgrade the multimodal operators from "plumbing tested,
decode stubbed" to a genuinely end-to-end decode path: fixtures are
ENCODED to real PNG/BMP/WAV containers, shipped as binary columns, and
DECODED back inside Arrow-batched ``mapInPandas`` stages — a bug on
either side breaks the value-level oracle match.

Scope is deliberate: 8-bit PNG color types 0/2/6 (gray/RGB/RGBA),
no interlacing; 24-bit uncompressed BMP; 16-bit mono PCM WAV. JPEG,
compressed BMP, MP3 and video stay behind NotImplementedError — those
require codecs the container does not have (operators/multimodal.py
keeps the honest stub for them).

These are fixture-scale codecs (tens-of-KB blobs, Python row loops
over scanlines); on a real cluster the decode body would be pillow /
libsndfile behind the SAME mapInPandas signature. Reference analogue:
the 2025 era treats S3 blobs as opaque files (src/etl_2025.py:53-84);
this module is the beyond-reference multimodal surface (SURVEY.md §7).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> channel count (8-bit depth only).
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(img: np.ndarray, filter_per_row: bool = True) -> bytes:
    """Encode an (h, w) or (h, w, ch) uint8 array as a real PNG.

    ``filter_per_row=True`` cycles through all five scanline filters
    (row index mod 5) so a decode round-trip exercises every
    reconstruction branch, not just filter 0.
    """
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    img = np.ascontiguousarray(img, dtype=np.uint8)

    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int16)
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int16)
        ft = (y % 5) if filter_per_row else 0
        if ft == 0:
            filt = row.copy()
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
            filt = (row - left) % 256
        elif ft == 2:  # Up
            filt = (row - prev) % 256
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
            filt = (row - (left + prev) // 2) % 256
        else:  # Paeth
            filt = np.empty_like(row)
            for i in range(len(row)):
                a = int(row[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                filt[i] = (int(row[i]) - _paeth(a, b, c)) % 256
        raw.append(ft)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray/RGB/RGBA) to
    (h, w, ch) uint8, reconstructing all five scanline filters."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = bit_depth = color_type = interlace = 0
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace} unsupported (8-bit 0/2/6 only)"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        filt = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int16)
        if ft == 0:
            recon = filt
        elif ft == 2:
            recon = (filt + prev) % 256
        elif ft in (1, 3, 4):
            recon = np.empty(stride, dtype=np.int16)
            for i in range(stride):
                a = int(recon[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[i - ch]) if i >= ch else 0
                    pred = _paeth(a, b, c)
                recon[i] = (int(filt[i]) + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out.reshape(h, w, ch)


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed
    BMP (BGR byte order, bottom-up rows, 4-byte row padding)."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, ch = img.shape
    if ch != 3:
        raise NotImplementedError("BMP encoder is 24-bit RGB only")
    pad = (-3 * w) % 4
    rows = bytearray()
    bgr = img[:, :, ::-1]
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.extend(np.ascontiguousarray(bgr[y]).tobytes())
        rows.extend(b"\x00" * pad)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40)
    return header + info + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, _planes, bitcount, compression = struct.unpack_from(
        "<IiiHHI", data, 14
    )
    if bitcount != 24 or compression != 0:
        raise NotImplementedError("BMP decoder is 24-bit uncompressed only")
    flip = h > 0
    h = abs(h)
    pad = (-3 * w) % 4
    stride = 3 * w + pad
    out = np.empty((h, w, 3), dtype=np.uint8)
    for row in range(h):
        off = offset + row * stride
        line = np.frombuffer(data, np.uint8, 3 * w, off).reshape(w, 3)
        y = h - 1 - row if flip else row
        out[y] = line[:, ::-1]  # BGR -> RGB
    return out


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 mono samples as a PCM WAV container."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV container to (int16 mono samples, rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise NotImplementedError("WAV decoder is 16-bit mono PCM only")
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    return np.frombuffer(frames, dtype="<i2"), rate


def decode_image(data: bytes) -> np.ndarray:
    """Container sniff + decode: PNG or BMP to (h, w, ch) uint8.
    Anything else (JPEG, video, ...) raises — see
    operators/multimodal.py decode_image_real for the honest stub."""
    b = bytes(data)
    if b[:8] == PNG_SIG:
        return decode_png(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    raise NotImplementedError(
        f"unsupported container (magic {b[:4]!r}); stdlib codecs cover "
        "PNG/BMP/WAV — install pillow/ffmpeg on executors for the rest"
    )


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (floor
    convention: src = dst * src_extent // dst_extent — reproducible
    in integer SQL, no float rounding hazard)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]
