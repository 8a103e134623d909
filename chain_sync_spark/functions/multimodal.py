"""Multimodal column support: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with
a typed metadata struct — the lakehouse-standard layout (content
column + sidecar metadata), so Spark never interprets the bytes until
an explicit decode step. The decode itself is a `mapInPandas` stage:
Arrow-batched, schema-stable, partition-parallel. SIX real codecs
are built in with no external dependencies beyond the stdlib: binary
PPM (P6), binary PGM (P5 grayscale, replicated to the shared RGB
tuple), uncompressed 24-bit BMP (BI_RGB), GIF87a/89a (full LZW
decode — variable code widths, CLEAR/EOI, 12-bit cap — plus
extensions, local color tables and interlacing; re-encode through a
real LZW compressor), and 8-bit PNG (chunk walk with CRC checks,
stdlib-zlib inflate, all five scanline filters, gray/RGB/palette/
alpha color types) images parse, feature-extract, and
nearest-neighbor resize through pure python/numpy (`_parse_image`
dispatch / `_resize_px`; each format re-encodes as itself, GIF by
resizing the INDEX matrix under its own color table), and RIFF/WAVE + AIFF
PCM audio parse and feature-extract (`_parse_wav` / `_parse_aiff`,
both endiannesses incl. the 80-bit extended-float AIFF sample rate) —
the reference implementations proving the seam end to end on genuine
pixels and samples. Richer codec libraries
(PIL / torchaudio / av) are NOT present in this environment, so for
every other format the codec call is isolated behind `decode_media`:
real decoding raises NotImplementedError with a clear message, and a
deterministic fake decoder (md5-seeded) stands in so the Spark-side
plumbing — schema, batching, UDF signature, partitioning — is real
and tested end to end.

Scale notes: payload bytes never shuffle (decode happens where the
row lives, mapInPandas preserves partitioning); feature extraction
emits fixed-width float vectors so downstream similarity ops (see
operators/llm_pipeline.py) apply unchanged; Arrow batch size bounds
executor memory per batch regardless of payload size distribution.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary,"
    " meta struct<width:int, height:int, format:string>"
)

FEATURE_DIM = 8
FEATURES_SCHEMA = f"media_id long, n_bytes int, features array<float>"

_FAKE_DECODE = True  # non-PPM codec libs absent — see module docstring


def _pnm_header(payload: bytes, magic: bytes):
    """Shared binary-PNM header walk: magic, then three whitespace-
    separated integers with '#' comments allowed, then ONE whitespace
    byte before the raw sample data.  Returns (w, h, maxval,
    data_offset) or None on any malformation."""
    if not payload or not payload.startswith(magic):
        return None
    i, vals = len(magic), []
    try:
        while len(vals) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                i = payload.index(b"\n", i) + 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        i += 1  # the single whitespace byte after maxval
        w, h, maxval = vals
        if w <= 0 or h <= 0 or not 0 < maxval < 256:
            return None
        return w, h, maxval, i
    except (ValueError, IndexError):
        return None  # malformed header → not decodable


def _parse_ppm(payload: bytes):
    """Parse a binary PPM (P6): returns (width, height, maxval,
    H×W×3 uint8 ndarray) or None when the payload is not P6.
    Pure numpy — no codec library."""
    import numpy as np

    hdr = _pnm_header(payload, b"P6")
    if hdr is None:
        return None
    w, h, maxval, i = hdr
    try:
        data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    except ValueError:
        return None  # short pixel data → not decodable
    return w, h, maxval, data.reshape(h, w, 3)


def _parse_pgm(payload: bytes):
    """Parse a binary PGM (P5, grayscale): same header grammar as P6,
    one byte per pixel.  Returns the SAME (width, height, maxval,
    H×W×3 ndarray) tuple as the color codecs — the gray plane
    replicated across channels — so features and resize apply
    unchanged (all three channel means equal the gray mean)."""
    import numpy as np

    hdr = _pnm_header(payload, b"P5")
    if hdr is None:
        return None
    w, h, maxval, i = hdr
    try:
        data = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=i)
    except ValueError:
        return None  # short pixel data → not decodable
    return w, h, maxval, np.repeat(data.reshape(h, w, 1), 3, axis=2)


def _ppm_features(img) -> list[float]:
    """FEATURE_DIM floats from real pixels: per-channel means, gray
    mean/std/min/max, aspect ratio — deterministic numpy float64."""
    w, h, maxval, px = img
    f = px.astype("float64") / float(maxval)
    gray = f.mean(axis=2)
    return [
        float(f[..., 0].mean()),
        float(f[..., 1].mean()),
        float(f[..., 2].mean()),
        float(gray.mean()),
        float(gray.std()),
        float(gray.min()),
        float(gray.max()),
        float(w) / float(h),
    ]


def _resize_px(img, target_w: int, target_h: int):
    """Nearest-neighbor resize of any parsed image tuple — index
    sampling (floor grid), deterministic on every platform. Shared by
    every image codec's resize path; each re-encodes as itself."""
    import numpy as np

    w, h, maxval, px = img
    rows = (np.arange(target_h) * h) // target_h
    cols = (np.arange(target_w) * w) // target_w
    return target_w, target_h, maxval, px[rows][:, cols]


def _encode_ppm(img) -> bytes:
    """Re-encode a parsed image tuple as binary PPM (P6)."""
    w, h, maxval, px = img
    return f"P6\n{w} {h}\n{maxval}\n".encode() + px.tobytes()


def _encode_pgm(img) -> bytes:
    """Re-encode a parsed image tuple as binary PGM (P5) — the red
    plane, which for anything parsed FROM a PGM is the gray plane
    (all three channels are replicas)."""
    w, h, maxval, px = img
    return f"P5\n{w} {h}\n{maxval}\n".encode() + px[..., 0].tobytes()


def _resize_ppm(img, target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resize of a parsed PPM, re-encoded as P6."""
    return _encode_ppm(_resize_px(img, target_w, target_h))


def _parse_bmp(payload: bytes):
    """Parse an uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB):
    returns the same (width, height, 255, H×W×3 uint8 RGB ndarray)
    tuple as `_parse_ppm`, or None when the payload is not such a
    BMP.  Handles the format's real quirks — rows padded to 4-byte
    boundaries, bottom-up row order (positive height) vs top-down
    (negative), BGR channel order — so features/resize code never
    sees them.  Pure numpy — no codec library."""
    import numpy as np

    if not payload or len(payload) < 54 or payload[:2] != b"BM":
        return None
    off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    planes = int.from_bytes(payload[26:28], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if (
        hdr_size < 40
        or planes != 1
        or bpp != 24
        or compression != 0  # BI_RGB only
        or w <= 0
        or h == 0
        or off < 54
    ):
        return None
    top_down = h < 0
    h_abs = -h if top_down else h
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if len(payload) < off + row_bytes * h_abs:
        return None  # truncated pixel data → not decodable
    data = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h_abs, offset=off
    )
    px = data.reshape(h_abs, row_bytes)[:, : w * 3].reshape(h_abs, w, 3)
    if not top_down:
        px = px[::-1]  # bottom-up storage → natural top-down order
    return w, h_abs, 255, px[..., ::-1]  # BGR → RGB


def _encode_bmp(img) -> bytes:
    """Re-encode a parsed image tuple as a bottom-up 24-bit BI_RGB
    BMP — the inverse of `_parse_bmp` (parse∘encode is identity on
    the pixel array)."""
    import numpy as np

    w, h, _maxval, px = img
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 dpi
        + (0).to_bytes(4, "little") * 2
    )
    header = (
        b"BM"
        + (54 + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
    )
    return header + info + data


def _gif_subblocks(payload: bytes, i: int):
    """Concatenate a GIF sub-block chain starting at offset ``i``:
    returns (bytes, offset_after_terminator) or None if truncated."""
    parts = []
    while True:
        if i >= len(payload):
            return None
        n = payload[i]
        i += 1
        if n == 0:
            return b"".join(parts), i
        if i + n > len(payload):
            return None
        parts.append(payload[i : i + n])
        i += n


def _lzw_decode(data: bytes, min_code: int, n_pixels: int):
    """GIF-variant LZW decode (LSB-first bit packing, CLEAR/EOI
    codes, 12-bit cap).  Returns exactly ``n_pixels`` indices or None
    on any malformation."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table: list[bytes] = [bytes([c]) for c in range(clear)] + [b"", b""]
    width = min_code + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                return None  # ran out of codes before n_pixels
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([c]) for c in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            return None  # EOI before the pixel count filled
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None  # code beyond the table → corrupt stream
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return list(out[:n_pixels])


# Interlaced GIF row passes: (start, step) in output row order.
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _parse_gif_indexed(payload: bytes):
    """Parse a GIF87a/89a's FIRST image frame in its native indexed
    form: returns (width, height, palette bytes, H×W uint8 index
    ndarray) or None.  Walks extensions, honors a local color table
    override, de-interlaces.  Pure python/numpy — no codec library."""
    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = payload[10]
    i = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = payload[i : i + n]
        if len(gct) < n:
            return None
        i += n
    while i < len(payload):
        b = payload[i]
        if b == 0x21:  # extension: label byte + sub-block chain
            sb = _gif_subblocks(payload, i + 2)
            if sb is None:
                return None
            i = sb[1]
        elif b == 0x2C:  # image descriptor
            if i + 10 > len(payload):
                return None
            w = int.from_bytes(payload[i + 5 : i + 7], "little")
            h = int.from_bytes(payload[i + 7 : i + 9], "little")
            ipacked = payload[i + 9]
            i += 10
            ct = gct
            if ipacked & 0x80:  # local color table overrides
                n = 3 * (2 << (ipacked & 0x07))
                ct = payload[i : i + n]
                if len(ct) < n:
                    return None
                i += n
            if w <= 0 or h <= 0 or ct is None or i >= len(payload):
                return None
            min_code = payload[i]
            if not 2 <= min_code <= 11:
                return None  # widths would exceed the 12-bit cap
            sb = _gif_subblocks(payload, i + 1)
            if sb is None:
                return None
            idx = _lzw_decode(sb[0], min_code, w * h)
            if idx is None or max(idx) * 3 >= len(ct):
                return None
            arr = np.asarray(idx, dtype=np.uint8).reshape(h, w)
            if ipacked & 0x40:  # interlaced: reorder the 4 passes
                order = [
                    r
                    for start, step in _GIF_INTERLACE
                    for r in range(start, h, step)
                ]
                fixed = np.empty_like(arr)
                fixed[order] = arr
                arr = fixed
            return w, h, ct, arr
        elif b == 0x3B:
            return None  # trailer before any image frame
        else:
            return None  # unknown block type → corrupt
    return None


def _parse_gif(payload: bytes):
    """GIF → the shared (width, height, 255, H×W×3 RGB uint8) image
    tuple: first frame's indices looked up through its color table."""
    import numpy as np

    g = _parse_gif_indexed(payload)
    if g is None:
        return None
    w, h, ct, idx = g
    pal = np.frombuffer(ct, dtype=np.uint8)
    pal = pal[: 3 * (len(pal) // 3)].reshape(-1, 3)
    return w, h, 255, pal[idx]


def _encode_gif(palette: bytes, idx) -> bytes:
    """Encode an indexed image as a single-frame GIF87a with a global
    color table and REAL LZW compression — the inverse of
    `_parse_gif_indexed` (parse∘encode is identity on palette-padded
    indices).  Pure python."""
    import numpy as np

    h, w = idx.shape
    # GCT size must be a power of two ≥ palette entries (min 2 bits
    # so min_code ≥ 2, the LZW floor)
    n_entries = max(4, len(palette) // 3)
    bits = max(2, (n_entries - 1).bit_length())
    ct = palette.ljust(3 * (1 << bits), b"\x00")[: 3 * (1 << bits)]
    min_code = bits
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    # LZW encode (dict on byte strings, 12-bit cap, CLEAR on overflow)
    codes = [clear]
    table = {bytes([c]): c for c in range(clear)}
    next_code = eoi + 1
    run = b""
    for px in np.asarray(idx, dtype=np.uint8).ravel().tobytes():
        cand = run + bytes([px])
        if cand in table:
            run = cand
            continue
        codes.append(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        else:
            codes.append(clear)
            table = {bytes([c]): c for c in range(clear)}
            next_code = eoi + 1
        run = bytes([px])
    if run:
        codes.append(table[run])
    codes.append(eoi)
    # pack codes LSB-first, widening exactly when the DECODER widens:
    # after it has added entry (1 << width) - 1
    out = bytearray()
    acc = nbits = 0
    width = min_code + 1
    decoder_table = clear + 2
    first_after_clear = True  # decoder adds NO entry for that code
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            width = min_code + 1
            decoder_table = clear + 2
            first_after_clear = True
        elif code != eoi:
            if first_after_clear:
                first_after_clear = False
            elif decoder_table < 4096:
                decoder_table += 1
                if decoder_table == (1 << width) and width < 12:
                    width += 1
    if nbits:
        out.append(acc & 0xFF)
    blocks = bytearray()
    for j in range(0, len(out), 255):
        chunk = out[j : j + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    header = (
        b"GIF87a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x80 | (bits - 1), 0, 0])
        + ct
        + b"\x2c"
        + (0).to_bytes(2, "little") * 2
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + b"\x00"
        + bytes([min_code])
    )
    return bytes(header) + bytes(blocks) + b"\x3b"


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (8-bit depths only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, w: int, h: int, ch: int):
    """Undo the five PNG scanline filters (None/Sub/Up/Average/Paeth)
    — inherently sequential per row, done in pure python over
    bytearrays.  Returns an H×W×ch uint8 ndarray or None."""
    import numpy as np

    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    out = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for x in range(ch, stride):
                row[x] = (row[x] + row[x - ch]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                row[x] = (row[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[x] = (row[x] + pr) & 0xFF
        elif ft != 0:
            return None  # unknown filter type
        out[y * stride : (y + 1) * stride] = row
        prev = row
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, ch)


def _parse_png(payload: bytes):
    """Parse an 8-bit non-interlaced PNG (gray / RGB / palette /
    gray+alpha / RGBA) through stdlib zlib: chunk walk with CRC
    verification, inflate, scanline unfilter, then normalize to the
    shared (width, height, 255, H×W×3 RGB uint8) tuple (gray
    replicates, alpha drops — features describe the color planes).
    Returns None for anything else (16-bit, Adam7) — the md5
    stand-in, not a wrong decode.  Pure python + stdlib zlib."""
    import zlib

    import numpy as np

    if not payload.startswith(_PNG_SIG):
        return None
    i = len(_PNG_SIG)
    w = h = None
    ctype = None
    plte = b""
    idat = []
    try:
        while i + 8 <= len(payload):
            n = int.from_bytes(payload[i : i + 4], "big")
            typ = payload[i + 4 : i + 8]
            data = payload[i + 8 : i + 8 + n]
            if len(data) < n or i + 12 + n > len(payload):
                return None  # truncated chunk
            crc = int.from_bytes(payload[i + 8 + n : i + 12 + n], "big")
            if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                return None  # corrupt chunk
            i += 12 + n
            if typ == b"IHDR":
                if n != 13:
                    return None
                w = int.from_bytes(data[0:4], "big")
                h = int.from_bytes(data[4:8], "big")
                depth, ctype, comp, filt, interlace = data[8:13]
                if (
                    depth != 8
                    or ctype not in _PNG_CHANNELS
                    or comp != 0
                    or filt != 0
                    or interlace != 0  # Adam7 → stand-in, not wrong pixels
                    or w <= 0
                    or h <= 0
                ):
                    return None
            elif typ == b"PLTE":
                plte = data
            elif typ == b"IDAT":
                idat.append(data)
            elif typ == b"IEND":
                break
        if w is None or not idat:
            return None
        raw = zlib.decompress(b"".join(idat))
    except (zlib.error, ValueError):
        return None
    ch = _PNG_CHANNELS[ctype]
    px = _png_unfilter(raw, w, h, ch)
    if px is None:
        return None
    if ctype == 2:
        rgb = px
    elif ctype == 6:
        rgb = px[..., :3]  # drop alpha
    elif ctype == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif ctype == 4:
        rgb = np.repeat(px[..., :1], 3, axis=2)
    else:  # palette
        if not plte or int(px.max()) * 3 >= len(plte):
            return None
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: 3 * (len(pal) // 3)].reshape(-1, 3)
        rgb = pal[px[..., 0]]
    return w, h, 255, rgb


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _encode_png(img) -> bytes:
    """Re-encode a parsed image tuple as an 8-bit RGB PNG (filter 0
    scanlines, one zlib-deflated IDAT) — the inverse of `_parse_png`
    on the pixel array.  Pure python + stdlib zlib."""
    import zlib

    import numpy as np

    w, h, _maxval, px = img
    body = np.asarray(px, dtype=np.uint8)
    raw = b"".join(
        b"\x00" + body[y].tobytes() for y in range(h)
    )
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _parse_image(payload: bytes):
    """Dispatch across the built-in image codecs: (parsed, format) or
    (None, None). New image codecs plug in here and in resize_media's
    re-encode arm only."""
    if not payload:
        # null/empty payloads are in-contract (extract_features counts
        # them as 0 bytes); the GIF/PNG probes below assume len()/
        # startswith work, so short-circuit before dispatch
        return None, None
    img = _parse_ppm(payload)
    if img is not None:
        return img, "ppm"
    img = _parse_pgm(payload)
    if img is not None:
        return img, "pgm"
    img = _parse_bmp(payload)
    if img is not None:
        return img, "bmp"
    img = _parse_gif(payload)
    if img is not None:
        return img, "gif"
    img = _parse_png(payload)
    if img is not None:
        return img, "png"
    return None, None


def _parse_wav(payload: bytes):
    """Minimal RIFF/WAVE parser: uncompressed PCM (format tag 1),
    8- or 16-bit, any channel count (downmixed to mono by mean).
    Walks the chunk list (word-aligned), so extra chunks (LIST, fact)
    are tolerated.  Returns (sample_rate, n_channels, float64 mono
    samples in [-1, 1]) or None when the payload is not such a WAV.
    Pure numpy — no codec library."""
    import numpy as np

    if (
        not payload
        or len(payload) < 44
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return None
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if n_ch < 1 or rate <= 0:
        return None
    if audio_format == 1 and bits == 16:
        s = (
            np.frombuffer(data, dtype="<i2", count=len(data) // 2).astype(
                "float64"
            )
            / 32768.0
        )
    elif audio_format == 1 and bits == 8:
        s = (np.frombuffer(data, dtype=np.uint8).astype("float64") - 128.0) / 128.0
    elif audio_format == 1 and bits == 24:
        # 3-byte little-endian signed: widen to int32 via zero-padded
        # low byte, then shift out — vectorized, no per-sample loop
        n = len(data) // 3
        b = np.frombuffer(data, dtype=np.uint8, count=n * 3).reshape(n, 3)
        wide = np.zeros((n, 4), dtype=np.uint8)
        wide[:, 1:] = b
        s = (wide.view("<i4").ravel() >> 8).astype("float64") / 8388608.0
    elif audio_format == 3 and bits == 32:  # IEEE float PCM
        s = np.frombuffer(data, dtype="<f4", count=len(data) // 4).astype(
            "float64"
        )
    else:
        return None
    if n_ch > 1:
        s = s[: (len(s) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    if len(s) == 0:
        return None
    return rate, n_ch, s


def _parse_aiff(payload: bytes):
    """Minimal AIFF parser — the big-endian IFF sibling of RIFF/WAVE:
    FORM/AIFF container, COMM (channels, frames, bits, 80-bit
    extended-float sample rate) + SSND chunks, 8- or 16-bit PCM, any
    channel count (downmixed to mono by mean).  Returns the same
    (sample_rate, n_channels, float64 mono samples) tuple as
    `_parse_wav` so the feature path is shared.  Pure numpy."""
    import numpy as np

    if (
        not payload
        or len(payload) < 12
        or payload[:4] != b"FORM"
        or payload[8:12] != b"AIFF"
    ):
        return None
    i, comm, ssnd = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "big")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if comm is None or ssnd is None or len(comm) < 18 or len(ssnd) < 8:
        return None
    n_ch = int.from_bytes(comm[0:2], "big", signed=True)
    bits = int.from_bytes(comm[6:8], "big", signed=True)
    # 80-bit extended float: 1 sign + 15 exponent bits, 64-bit mantissa
    exp = int.from_bytes(comm[8:10], "big") & 0x7FFF
    mant = int.from_bytes(comm[10:18], "big")
    if exp == 0 or mant == 0:
        return None
    rate = int(round(mant * 2.0 ** (exp - 16383 - 63)))
    if n_ch < 1 or rate <= 0 or bits not in (8, 16):
        return None
    offset = int.from_bytes(ssnd[0:4], "big")
    data = ssnd[8 + offset :]
    if bits == 16:
        s = (
            np.frombuffer(data, dtype=">i2", count=len(data) // 2).astype(
                "float64"
            )
            / 32768.0
        )
    else:  # AIFF 8-bit is SIGNED (unlike WAV's unsigned)
        s = np.frombuffer(data, dtype=np.int8).astype("float64") / 128.0
    if n_ch > 1:
        s = s[: (len(s) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    if len(s) == 0:
        return None
    return rate, n_ch, s


def _wav_features(aud) -> list[float]:
    """FEATURE_DIM floats from real samples: duration, RMS, mean,
    peak, zero-crossing rate, normalized sample rate, channel count,
    std — deterministic numpy float64."""
    import numpy as np

    rate, n_ch, s = aud
    zc = float(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1])))
    return [
        float(len(s)) / float(rate),
        float(np.sqrt((s * s).mean())),
        float(s.mean()),
        float(np.abs(s).max()),
        zc / float(len(s)),
        float(rate) / 48000.0,
        float(n_ch),
        float(s.std()),
    ]


def decode_media(payload: bytes, kind: str) -> list[float]:
    """Decode one payload into a fixed-width feature vector.

    Image payloads in binary PPM (P6), binary PGM (P5), uncompressed
    24-bit BMP, GIF or 8-bit PNG and audio payloads in uncompressed
    RIFF/WAVE PCM decode for REAL — header parse (LZW decompression
    for GIF, zlib inflate + scanline unfiltering for PNG), pixel or
    sample statistics — through the pure-python codecs above.
    Other formats would dispatch on `kind` to PIL (image), soundfile
    (audio), or av (video frame sampling); those libraries are
    unavailable here, so the deterministic fake derives features from
    the md5 digest — stable across runs and engines, preserving
    testability of everything around the codec."""
    if kind == "image":
        img, _fmt = _parse_image(payload)
        if img is not None:
            return _ppm_features(img)
    if kind == "audio":
        aud = _parse_wav(payload)
        if aud is None:
            aud = _parse_aiff(payload)
        if aud is not None:
            return _wav_features(aud)
    if not _FAKE_DECODE:  # pragma: no cover — flipped on real deployments
        raise NotImplementedError(
            f"real {kind} decoding requires codec libraries (PIL/soundfile/av) "
            "not present in this environment"
        )
    digest = hashlib.md5(payload or b"").digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def documents_as_media(docs: DataFrame) -> DataFrame:
    """View the documents table through the media layout: UTF-8 bytes
    as the payload, metadata derived from document properties. This is
    the ingestion shape a real image/audio table would have."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit("utf-8").alias("format"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction stage: (media_id, kind, payload)
    → (media_id, n_bytes, features[FEATURE_DIM]). Arrow-batched; one
    python process per partition, no shuffle."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_media(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _batches, schema=FEATURES_SCHEMA
    )


def resize_media(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stage: (media_id, kind, payload, meta) → same layout
    with meta.width/height replaced and the payload re-encoded.
    PPM (P6) and 24-bit BMP image payloads resize for REAL —
    nearest-neighbor index sampling in numpy, each re-encoded as its
    own format.  Other formats' re-encode
    would call the codec (PIL .resize / ffmpeg scale); their
    deterministic stand-in truncates-or-pads the payload to the byte
    budget implied by the target dimensions, preserving the invariant
    a real resize has: output size is a function of target dims, not
    input size.

    Spark-side plumbing is the real thing: Arrow-batched mapInPandas,
    schema-stable, partition-preserving — payload bytes never
    shuffle. Aspect-ratio metadata math runs here (not in the codec)
    so the plan carries it even where the stand-in runs."""
    for label, dim in (("target_w", target_w), ("target_h", target_h)):
        # fail fast on the driver: GIF's 2-byte logical-screen fields
        # overflow past 65535 (struct raises mid-task), and the other
        # encoders would allocate absurd buffers
        if not 1 <= dim <= 65535:
            raise ValueError(f"{label} must be in 1..65535, got {dim}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        budget = target_w * target_h  # 1 byte/px stand-in for the codec
        for pdf in it:
            payloads, formats = [], []
            for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                img, fmt = _parse_image(p) if k == "image" else (None, None)
                if img is not None:
                    if fmt == "gif":
                        # resize the INDEX matrix and keep the color
                        # table — nearest-neighbor on an indexed image
                        # never invents colors, so no quantization
                        import numpy as np

                        gw, gh, ct, gidx = _parse_gif_indexed(p)
                        rows = (np.arange(target_h) * gh) // target_h
                        cols = (np.arange(target_w) * gw) // target_w
                        payloads.append(_encode_gif(ct, gidx[rows][:, cols]))
                        formats.append(fmt)
                        continue
                    small = _resize_px(img, target_w, target_h)
                    encode = {
                        "bmp": _encode_bmp,
                        "pgm": _encode_pgm,
                        "png": _encode_png,
                    }.get(fmt, _encode_ppm)
                    payloads.append(encode(small))
                    formats.append(fmt)
                    continue
                if not _FAKE_DECODE:  # pragma: no cover — real codec seam
                    raise NotImplementedError(
                        "real resize requires codec libraries (PIL/av) "
                        "not present in this environment"
                    )
                payloads.append((p or b"")[:budget].ljust(budget, b"\0"))
                formats.append((m or {}).get("format"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": [
                        {"width": target_w, "height": target_h, "format": fmt}
                        for fmt in formats
                    ],
                }
            )

    return media.select("media_id", "kind", "payload", "meta").mapInPandas(
        _batches, schema=MEDIA_SCHEMA
    )


def _encode_wav_mono16(rate: int, samples) -> bytes:
    """Minimal RIFF/WAVE encoder: 16-bit PCM, mono.  Quantization is
    clip-to-[-1,1] then floor(x*32768 + 0.5) clamped to int16 — the
    inverse of _parse_wav's /32768 scaling, so parse(encode(x))
    returns exactly the quantized samples (roundtrip property
    pytest-pinned)."""
    import struct

    import numpy as np

    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = np.clip(np.floor(x * 32768.0 + 0.5), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def resample_audio(media: DataFrame, factor: int) -> DataFrame:
    """Audio decimation stage: (media_id, kind, payload, meta) → same
    layout with every ``factor``-th mono sample kept and the payload
    re-encoded as 16-bit mono WAV at rate // factor.  WAV (8/16/24-bit
    + float PCM) and AIFF payloads decimate for REAL through the
    stdlib codecs — parse to mono float, stride-slice, re-encode; a
    real anti-aliased resampler would low-pass first (scipy/soxr),
    which is the documented external-library boundary, same as the
    lossy image codecs.  Non-audio rows pass through UNCHANGED (a
    resampler must not mangle images); unparsable audio payloads take
    the deterministic stand-in (every factor-th byte) behind the
    _FAKE_DECODE seam.  Output meta: width = sample count, height =
    output rate, format 'wav'.

    Spark-side plumbing is the real thing: Arrow-batched mapInPandas,
    schema-stable, partition-preserving — payload bytes never
    shuffle."""
    if not isinstance(factor, int) or factor < 1:
        # fail fast on the driver, not inside a task (ADVICE r8 rule)
        raise ValueError(f"factor must be an integer >= 1, got {factor}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_p, out_m = [], []
            for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                if k != "audio":
                    out_p.append(p)
                    out_m.append(m)
                    continue
                aud = _parse_wav(p)
                if aud is None:
                    aud = _parse_aiff(p)
                if aud is not None:
                    rate, _n_ch, s = aud
                    kept = s[::factor]
                    new_rate = max(rate // factor, 1)
                    out_p.append(_encode_wav_mono16(new_rate, kept))
                    out_m.append(
                        {"width": len(kept), "height": new_rate,
                         "format": "wav"}
                    )
                    continue
                if not _FAKE_DECODE:  # pragma: no cover — real codec seam
                    raise NotImplementedError(
                        "real audio resampling requires codec libraries "
                        "(soundfile/soxr) not present in this environment"
                    )
                kept_b = (p or b"")[::factor]
                out_p.append(kept_b)
                out_m.append(
                    {"width": len(kept_b), "height": 0,
                     "format": (m or {}).get("format")}
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_p,
                    "meta": out_m,
                }
            )

    return media.select("media_id", "kind", "payload", "meta").mapInPandas(
        _batches, schema=MEDIA_SCHEMA
    )


def _parse_y4m(payload: bytes):
    """Parse an uncompressed YUV4MPEG2 (.y4m) video: stream header
    (W/H/F rate tags, C420* or C444 colorspace), then FRAME-delimited
    raw planes.  Returns (width, height, fps_num, fps_den, list of
    H×W uint8 LUMA planes) or None.  The luma plane is what frame
    statistics run on; chroma is skipped by stride.  Pure numpy."""
    import numpy as np

    if not payload.startswith(b"YUV4MPEG2"):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    num, den = 25, 1
    csp = "420"
    for tag in payload[9:nl].split(b" "):
        if not tag:
            continue
        k, v = tag[:1], tag[1:]
        try:
            if k == b"W":
                w = int(v)
            elif k == b"H":
                h = int(v)
            elif k == b"F":
                num, den = (int(x) for x in v.split(b":"))
            elif k == b"C":
                csp = v.decode("ascii", "replace")
        except ValueError:
            return None
    if not w or not h or w <= 0 or h <= 0 or num <= 0 or den <= 0:
        return None
    if csp.startswith("420"):
        frame_bytes = w * h * 3 // 2
    elif csp.startswith("444"):
        frame_bytes = w * h * 3
    else:
        return None  # interlaced/exotic chroma → stand-in
    frames = []
    i = nl + 1
    while i < len(payload):
        fnl = payload.find(b"\n", i)
        if fnl < 0 or payload[i : i + 5] != b"FRAME":
            return None
        i = fnl + 1
        if i + frame_bytes > len(payload):
            return None  # truncated frame
        y = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=i)
        frames.append(y.reshape(h, w))
        i += frame_bytes
    if not frames:
        return None
    return w, h, num, den, frames


def extract_frame_features(media: DataFrame, every_n: int = 1) -> DataFrame:
    """Per-frame feature extraction for video payloads — the REAL
    frame-sampling path: YUV4MPEG2 payloads decode (header parse,
    frame stride, luma plane) and every ``every_n``-th frame emits
    genuine luma statistics (mean/std/min/max, frame index, timestamp
    seconds, dims); non-Y4M video payloads keep the deterministic
    md5 stand-in — one pseudo-frame per 64-byte window — so the
    1→N fan-out plumbing is exercised for every row.

    Output: (media_id, frame_idx, n_frames, features[FEATURE_DIM]).

    Scale: mapInPandas, payload bytes never shuffle, and the fan-out
    is rows×frames — bound it with ``every_n`` (the sampling dial a
    real pipeline sets to ~1 frame/sec) before any downstream join."""
    if every_n < 1:
        # fail fast on the driver: range(0, n, 0) would raise
        # ValueError inside the task and negatives silently emit
        # nothing
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "n_frames": [], "features": []}
            for mid, kind, p in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                vid = _parse_y4m(bytes(p) if p is not None else b"")
                if vid is not None:
                    w, h, num, den, frames = vid
                    n = len(frames)
                    for fi in range(0, n, every_n):
                        y = frames[fi].astype("float64") / 255.0
                        out["media_id"].append(mid)
                        out["frame_idx"].append(fi)
                        out["n_frames"].append(n)
                        out["features"].append([
                            float(y.mean()),
                            float(y.std()),
                            float(y.min()),
                            float(y.max()),
                            float(fi) * den / num,  # timestamp sec
                            float(w) / float(h),
                            float(n),
                            float(num) / float(den),
                        ])
                    continue
                if not _FAKE_DECODE:  # pragma: no cover — real codec seam
                    raise NotImplementedError(
                        "real video decoding requires codec libraries (av) "
                        "not present in this environment"
                    )
                raw = bytes(p) if p is not None else b""
                n = max(1, (len(raw) + 63) // 64)
                for fi in range(0, n, every_n):
                    digest = hashlib.md5(raw[fi * 64 : (fi + 1) * 64]).digest()
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["n_frames"].append(n)
                    out["features"].append(
                        [digest[i] / 255.0 for i in range(FEATURE_DIM)]
                    )
            if not out["media_id"]:
                continue  # all-image batch: empty float64 cols would
                # fail Arrow's list<float> conversion
            out["features"] = pd.Series(out["features"], dtype="object")
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        _batches,
        schema="media_id long, frame_idx int, n_frames int, features array<float>",
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stub for video payloads: emits one row per
    sampled "frame" offset (1→N fan-out via posexplode over an offset
    sequence — pure column ops; the per-frame decode would plug into
    decode_media). Demonstrates the explode-shaped multimodal op."""
    n = F.length(F.col("payload"))
    offsets = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return media.select(
        "media_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )
