"""Pure-stdlib media codecs: PNG, BMP, GIF, and PCM WAV.

The container ships no image/audio libraries (no PIL, no ffmpeg), but
four real container formats are decodable with nothing beyond the
standard library: PNG (zlib inflate + the five scanline filters), BMP
(24-bit uncompressed, struct), GIF (palette + LZW, implemented here),
and WAV (PCM, the ``wave`` module).
These codecs upgrade the multimodal operators from "plumbing tested,
decode stubbed" to a genuinely end-to-end decode path: fixtures are
ENCODED to real PNG/BMP/WAV containers, shipped as binary columns, and
DECODED back inside Arrow-batched ``mapInPandas`` stages — a bug on
either side breaks the value-level oracle match.

Scope is deliberate: 8-bit PNG color types 0/2/6 (gray/RGB/RGBA),
no interlacing; 24-bit uncompressed BMP; single-frame global-palette
GIF (no interlace); 16-bit mono PCM WAV. JPEG, compressed BMP, MP3
and video stay behind NotImplementedError — those
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
    if b[:6] in (b"GIF89a", b"GIF87a"):
        return decode_gif(b)
    raise NotImplementedError(
        f"unsupported container (magic {b[:4]!r}); stdlib codecs cover "
        "PNG/BMP/GIF/WAV — install pillow/ffmpeg on executors for the rest"
    )


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (floor
    convention: src = dst * src_extent // dst_extent — reproducible
    in integer SQL, no float rounding hazard)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


GIF_SIG = b"GIF89a"


def encode_gif(img: np.ndarray) -> bytes:
    """GIF89a encoder: single frame, global color table, LZW
    (variable-code-width, per the spec), no interlace. Palette is
    built from the frame's unique colors in first-appearance scan
    order (≤256 — fixture grids are few-color by construction)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise NotImplementedError("GIF encoder is RGB only")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette: list[tuple[int, int, int]] = []
    index_of: dict[tuple[int, int, int], int] = {}
    idx = np.empty(len(flat), dtype=np.int32)
    for i, px in enumerate(map(tuple, flat.tolist())):
        j = index_of.get(px)
        if j is None:
            j = index_of[px] = len(palette)
            palette.append(px)
        idx[i] = j
    if len(palette) > 256:
        raise NotImplementedError("GIF encoder needs a <=256-color frame")
    # color table size: 2^(n+1) entries, minimum 2
    n = max(1, (len(palette) - 1).bit_length())
    table = palette + [(0, 0, 0)] * ((1 << n) - len(palette))
    out = bytearray()
    out += GIF_SIG
    out += struct.pack("<HHBBB", w, h, 0xF0 | (n - 1), 0, 0)
    out += b"".join(bytes(c) for c in table)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, n)
    out.append(min_code)
    out += _lzw_compress(idx.tolist(), min_code)
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _lzw_compress(indices: list[int], min_code: int) -> bytes:
    """GIF-flavor LZW: emits CLEAR first, grows code width at table
    fill, resets at 4096, packs codes little-endian LSB-first into
    255-byte sub-blocks."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    bits = bytearray()
    acc = 0
    nacc = 0
    width = min_code + 1

    def emit(code: int):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    seq: tuple[int, ...] = ()
    for k in indices:
        cand = seq + (k,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        seq = (k,)
    if seq:
        emit(table[seq])
    emit(end)
    if nacc:
        bits.append(acc & 0xFF)
    blocks = bytearray()
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    return bytes(blocks)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF decoder: first frame, global color table, LZW inflate
    with variable code width; interlace and local color tables are
    out of scope (NotImplementedError, same honesty rule as the
    other codecs)."""
    b = bytes(data)
    if b[:6] not in (GIF_SIG, b"GIF87a"):
        raise NotImplementedError("not a GIF container")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    if not flags & 0x80:
        raise NotImplementedError("GIF decoder needs a global color table")
    n = (flags & 0x07) + 1
    table = np.frombuffer(
        b[pos : pos + 3 * (1 << n)], dtype=np.uint8
    ).reshape(-1, 3)
    pos += 3 * (1 << n)
    # skip extension blocks to the first image descriptor
    while b[pos] == 0x21:
        pos += 2
        while b[pos]:
            pos += 1 + b[pos]
        pos += 1
    if b[pos] != 0x2C:
        raise NotImplementedError("no image descriptor found")
    _l, _t, iw, ih, iflags = struct.unpack("<HHHHB", b[pos + 1 : pos + 10])
    pos += 10
    if iflags & 0xC0:
        raise NotImplementedError(
            "interlaced / local-color-table GIFs unsupported"
        )
    min_code = b[pos]
    pos += 1
    stream = bytearray()
    while b[pos]:
        ln = b[pos]
        stream += b[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    indices = _lzw_decompress(bytes(stream), min_code, iw * ih)
    return table[np.array(indices, dtype=np.int32)].reshape(ih, iw, 3)


def _lzw_decompress(data: bytes, min_code: int, n_pixels: int) -> list[int]:
    clear, end = 1 << min_code, (1 << min_code) + 1
    acc = 0
    nacc = 0
    pos = 0
    width = min_code + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while len(out) < n_pixels:
        while nacc < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        else:
            entry = prev + (prev[0],)
            table.append(entry)
        out.extend(entry)
        if len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry
    return out[:n_pixels]
