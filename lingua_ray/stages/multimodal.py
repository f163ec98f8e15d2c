"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The decode libraries (PIL/ffmpeg/torchaudio) are not available in this
environment; most *decode* paths are nonetheless REAL pure-NumPy/stdlib
codecs (PNG/GIF/JPEG incl. arithmetic-coded/VP8L images,
WAV/G.711/ADPCM/FLAC audio, MJPEG in AVI/MP4/MKV video) and the
residual boundary — lossy VP8, mp3/ogg sample decode, inter-frame
video codecs — is a clearly-marked
``NotImplementedError`` (real mode) or a deterministic fake derived from the
payload bytes (test mode).  Everything Ray-side is real and tested: schema,
actor-pool signature, per-batch memory sizing, output layout.

At 100 TB scale these stages run as actor pools with small ``batch_size``
(large binary payloads × concurrency must fit worker heaps) — callers should
use ``map_batches(ImageDecoder, batch_size=32, concurrency=N, num_cpus=1)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from .util import set_column

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # "image" | "audio" | "video"
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
    ("meta", pa.string()),          # JSON metadata
])


def make_fake_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic opaque payloads for plumbing tests."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.randint(0, 3, size=n)]
    payloads = [rng.bytes(rng.randint(64, 512)) for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "kind": pa.array(kinds, type=pa.string()),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "mime": pa.array(["application/octet-stream"] * n),
        "meta": pa.array(["{}"] * n),
    })


def _parse_image_dims(p: bytes) -> tuple[str | None, int, int]:
    """(format, width, height) from container headers — REAL parsing, no
    codec library needed (PNG/GIF/BMP fixed offsets; JPEG marker walk to
    the first SOF segment).  Returns (None, -1, -1) for unrecognized
    payloads."""
    import struct
    if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
        w, h = struct.unpack(">II", p[16:24])
        return "png", w, h
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", p[6:10])
        return "gif", w, h
    if len(p) >= 26 and p[:2] == b"BM":
        w, h = struct.unpack("<ii", p[18:26])
        return "bmp", w, abs(h)
    if len(p) >= 4 and p[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(p):
            if p[i] != 0xFF:
                i += 1
                continue
            marker = p[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", p[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", p[i + 5:i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
        return "jpeg", -1, -1
    if len(p) >= 16 and p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        cc = p[12:16]
        if cc == b"VP8 " and len(p) >= 30 and p[23:26] == b"\x9d\x01\x2a":
            w = struct.unpack("<H", p[26:28])[0] & 0x3FFF
            h = struct.unpack("<H", p[28:30])[0] & 0x3FFF
            return "webp", w, h
        if cc == b"VP8L" and len(p) >= 25 and p[20] == 0x2F:
            bits = struct.unpack("<I", p[21:25])[0]
            return "webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
        if cc == b"VP8X" and len(p) >= 30:
            w = int.from_bytes(p[24:27], "little") + 1
            h = int.from_bytes(p[27:30], "little") + 1
            return "webp", w, h
        return "webp", -1, -1
    if len(p) >= 8 and p[:4] in (b"II*\x00", b"MM\x00*"):
        # TIFF: walk the first IFD for ImageWidth (256) / ImageLength (257)
        end = "<" if p[:2] == b"II" else ">"
        ifd = struct.unpack(f"{end}I", p[4:8])[0]
        w = h = -1
        if ifd + 2 <= len(p):
            n_ent = struct.unpack(f"{end}H", p[ifd:ifd + 2])[0]
            for e in range(n_ent):
                o = ifd + 2 + 12 * e
                if o + 12 > len(p):
                    break
                tag, typ = struct.unpack(f"{end}HH", p[o:o + 4])
                if tag in (256, 257):
                    # inline value: SHORT(3) uses the first 2 value bytes,
                    # LONG(4) all 4 (spec: left-justified in the field)
                    val = (struct.unpack(f"{end}H", p[o + 8:o + 10])[0]
                           if typ == 3 else
                           struct.unpack(f"{end}I", p[o + 8:o + 12])[0])
                    if tag == 256:
                        w = val
                    else:
                        h = val
        return "tiff", w, h
    if len(p) >= 2 and p[:2] in (b"P5", b"P6"):
        dims = _parse_pnm_header(p)
        if dims is not None:
            return ("pgm" if p[:2] == b"P5" else "ppm"), dims[0], dims[1]
        return ("pgm" if p[:2] == b"P5" else "ppm"), -1, -1
    return None, -1, -1


def _parse_pnm_header(p: bytes):
    """(width, height, maxval, raster_offset) of a binary netpbm payload
    (P5 grayscale / P6 RGB), honoring '#' comments.  None if malformed."""
    i, fields = 2, []
    while i < len(p) and len(fields) < 3:
        c = p[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < len(p) and p[i:i + 1] != b"\n":
                i += 1
        elif c.isdigit():
            j = i
            while j < len(p) and p[j:j + 1].isdigit():
                j += 1
            fields.append(int(p[i:j]))
            i = j
        else:
            return None
    if len(fields) < 3 or i >= len(p) or not p[i:i + 1].isspace():
        return None
    return fields[0], fields[1], fields[2], i + 1


def image_dims_batch(batch: pa.Table,
                     payload_col: str = "payload") -> pa.Table:
    """Append (format, width, height) parsed from the binary payload's
    container header — the pre-decode resolution/format filter every
    image pipeline wants BEFORE shipping payloads to expensive decoders.
    Unlike the decode stages below this is fully real: header offsets
    need no codec library."""
    payloads = batch.column(payload_col).to_pylist()
    fmts, ws, hs = [], [], []
    for p in payloads:
        f, w, h = _parse_image_dims(p or b"")
        fmts.append(f)
        ws.append(w)
        hs.append(h)
    batch = set_column(batch, "format", pa.array(fmts, type=pa.string()))
    batch = set_column(batch, "width", pa.array(ws, type=pa.int32()))
    batch = set_column(batch, "height", pa.array(hs, type=pa.int32()))
    return batch


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int):
    """Reverse the per-scanline PNG filters (spec §9).  ``raw`` is the
    decompressed stream, h rows of (1 filter byte + stride data bytes).
    Sub is vectorized as a per-lane cumsum mod 256; Up is one vector add;
    Average/Paeth walk pixels within the row (lanes vectorized)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    rows = raw[: h * (stride + 1)].reshape(h, stride + 1)
    for y in range(h):
        ftype, row = rows[y, 0], rows[y, 1:].copy()
        if ftype == 0:
            rec = row
        elif ftype == 1:  # Sub: cumsum per byte lane, mod 256
            lanes = row.reshape(-1, bpp).astype(np.uint64)
            rec = np.cumsum(lanes, axis=0, dtype=np.uint64) \
                    .astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            rec = row + prev
        elif ftype == 3:  # Average
            rec = row
            rec[:bpp] += (prev[:bpp] // 2).astype(np.uint8)
            for x in range(bpp, stride, bpp):
                left = rec[x - bpp:x].astype(np.uint16)
                up = prev[x:x + bpp].astype(np.uint16)
                rec[x:x + bpp] += ((left + up) // 2).astype(np.uint8)
        elif ftype == 4:  # Paeth
            rec = row
            rec[:bpp] += prev[:bpp]
            for x in range(bpp, stride, bpp):
                a = rec[x - bpp:x].astype(np.int32)
                b = prev[x:x + bpp].astype(np.int32)
                c = prev[x - bpp:x].astype(np.int32)
                pp = a + b - c
                pa_, pb, pc = np.abs(pp - a), np.abs(pp - b), np.abs(pp - c)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), a,
                                np.where(pb <= pc, b, c))
                rec[x:x + bpp] += pred.astype(np.uint8)
        else:
            return None
        out[y] = prev = rec
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per PNG spec §8.2, in pass order.
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

# legal bit depths per color type (PNG spec §11.2.2)
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}


def _png_samples(rows: np.ndarray, pw: int, channels: int, depth: int):
    """Unfiltered byte rows (ph, stride) → (ph, pw, channels) samples
    (uint8 for depth ≤ 8, uint16 for depth 16; sub-byte depths are
    always single-channel per the spec)."""
    ph = rows.shape[0]
    if depth == 8:
        return rows[:, :pw * channels].reshape(ph, pw, channels)
    if depth == 16:
        b = rows[:, :pw * channels * 2].reshape(ph, pw * channels, 2)
        v = (b[:, :, 0].astype(np.uint16) << 8) | b[:, :, 1]
        return v.reshape(ph, pw, channels)
    bits = np.unpackbits(rows, axis=1)[:, :pw * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    v = (bits.reshape(ph, pw, depth) * weights).sum(axis=2)
    return v.reshape(ph, pw, 1).astype(np.uint8)


def _decode_png(p: bytes, pixels: bool = False):
    """REAL PNG decode — zlib (stdlib) inflate + numpy unfiltering.
    Supports every legal IHDR shape: bit depths 1/2/4/8/16, color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), both
    non-interlaced and Adam7-interlaced (each of the 7 passes is its own
    filtered sub-image, scattered back onto the (dx, dy) grid).
    Returns (width, height, mean_luma) — luma averaged at the native
    sample precision — or, with ``pixels=True``, the uint8 pixel array
    ((H, W) gray or (H, W, 3) RGB, alpha dropped; 16-bit samples take
    the high byte, sub-byte gray rescales by 255/maxval) — or None
    (not PNG / malformed)."""
    import struct
    import zlib
    if not p.startswith(_PNG_SIG) or len(p) < 33:
        return None
    if p[12:16] != b"IHDR":
        return None
    w, h, depth, ctype, _comp, _filt, interlace = \
        struct.unpack(">IIBBBBB", p[16:29])
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None or depth not in _PNG_DEPTHS[ctype] \
            or interlace not in (0, 1) \
            or w <= 0 or h <= 0 or w * h > 64_000_000:
        return None
    idat, plte, j = [], None, 8
    while j + 8 <= len(p):
        ln, tag = struct.unpack(">I4s", p[j:j + 8])
        if j + 8 + ln > len(p):
            return None
        if tag == b"IDAT":
            idat.append(p[j + 8:j + 8 + ln])
        elif tag == b"PLTE":
            plte = np.frombuffer(p[j + 8:j + 8 + ln],
                                 dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        j += 12 + ln  # length + tag + data + crc
    if not idat or (ctype == 3 and plte is None):
        return None
    try:
        raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    except zlib.error:
        return None
    bpp_bits = depth * channels
    fbpp = max(1, bpp_bits // 8)    # filter-lane distance, ≥1 byte

    def decode_pass(off: int, pw: int, ph: int):
        stride = (pw * bpp_bits + 7) // 8
        need = ph * (stride + 1)
        if len(raw) - off < need:
            return None
        rows = _png_unfilter(raw[off:off + need], ph, stride, fbpp)
        if rows is None:
            return None
        return _png_samples(rows, pw, channels, depth), off + need

    if interlace == 0:
        got = decode_pass(0, w, h)
        if got is None:
            return None
        px = got[0]
    else:
        px = np.zeros((h, w, channels),
                      dtype=np.uint16 if depth == 16 else np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw, ph = -(-(w - x0) // dx), -(-(h - y0) // dy)
            if pw <= 0 or ph <= 0:
                continue        # pass empty for this image size
            got = decode_pass(off, pw, ph)
            if got is None:
                return None
            px[y0::dy, x0::dx], off = got

    maxv = (1 << depth) - 1
    if ctype == 3:
        idx = px[:, :, 0].reshape(-1)
        if idx.max(initial=0) >= len(plte):
            return None  # index past the palette: malformed, not a codec gap
        if pixels:
            return plte[idx].reshape(h, w, 3).copy()
        rgb = plte[idx].astype(np.float64)
        luma = (rgb @ np.array([0.299, 0.587, 0.114])).mean() / 255.0
    elif ctype in (2, 6):
        if pixels:
            rgb8 = px[:, :, :3] >> 8 if depth == 16 else px[:, :, :3]
            return np.ascontiguousarray(rgb8.astype(np.uint8))
        rgb = px[:, :, :3].reshape(-1, 3).astype(np.float64)
        luma = (rgb @ np.array([0.299, 0.587, 0.114])).mean() / maxv
    else:  # 0, 4: first channel is gray
        gray = px[:, :, 0]
        if pixels:
            if depth == 16:
                return np.ascontiguousarray((gray >> 8).astype(np.uint8))
            if depth < 8:       # 255/maxv is exact for depths 1/2/4
                return (gray.astype(np.uint16)
                        * (255 // maxv)).astype(np.uint8)
            return np.ascontiguousarray(gray)
        luma = float(gray.mean()) / maxv
    return int(w), int(h), float(luma)


_LUMA_W = np.array([0.299, 0.587, 0.114])


def _lzw_decode(data: bytes, mcs: int, max_pixels: int):
    """GIF-variant LZW: LSB-first variable-width codes, CLEAR/END codes,
    12-bit dictionary cap.  Returns up to ``max_pixels`` decoded palette
    indices as bytes, or None on a corrupt stream."""
    clear = 1 << mcs
    end = clear + 1
    singles = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(singles)
    width = mcs + 1
    val = int.from_bytes(data, "little")
    nbits = len(data) * 8
    pos = 0
    out = bytearray()
    prev = None
    while pos + width <= nbits and len(out) < max_pixels:
        code = (val >> pos) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = list(singles)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and code != end and code != clear:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:max_pixels])


def _decode_gif(p: bytes, pixels: bool = False):
    """REAL GIF pixel decode of the FIRST frame — pure block walk +
    LZW inflate, no codec library.  Handles global/local palettes,
    interlacing (row-reorder) and GCE transparency (transparent pixels
    take the background color); a frame smaller than the logical screen
    is composed onto the background-filled screen, matching what a
    viewer shows for frame 1.  Returns (width, height, mean_luma) — or,
    with ``pixels=True``, the composed uint8 (H, W, 3) RGB screen — or
    None (not a GIF / malformed / frame overflows the screen)."""
    if len(p) < 13 or p[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    import struct
    sw, sh = struct.unpack("<HH", p[6:10])
    flags, bg_idx = p[10], p[11]
    if sw <= 0 or sh <= 0 or sw * sh > 64_000_000:
        return None
    i, gpal = 13, None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if 13 + 3 * n > len(p):
            return None
        gpal = np.frombuffer(p[13:13 + 3 * n],
                             dtype=np.uint8).reshape(-1, 3)
        i = 13 + 3 * n
    transparent = None
    while i < len(p):
        b = p[i]
        if b == 0x3B:
            return None  # trailer before any image
        if b == 0x21:  # extension: note GCE transparency, skip the rest
            if (i + 7 <= len(p) and p[i + 1] == 0xF9 and p[i + 2] >= 4
                    and p[i + 3] & 1):
                transparent = p[i + 6]
            j = i + 2
            while j < len(p) and p[j] != 0:
                j += 1 + p[j]
            i = j + 1
            continue
        if b != 0x2C:
            return None
        # image descriptor: decode THIS (first) frame
        if i + 10 > len(p):
            return None
        fx, fy, fw, fh = struct.unpack("<HHHH", p[i + 1:i + 9])
        lf = p[i + 9]
        i += 10
        pal = gpal
        if lf & 0x80:
            n = 2 << (lf & 7)
            if i + 3 * n > len(p):
                return None
            pal = np.frombuffer(p[i:i + 3 * n],
                                dtype=np.uint8).reshape(-1, 3)
            i += 3 * n
        if (pal is None or fw == 0 or fh == 0
                or fx + fw > sw or fy + fh > sh or i >= len(p)):
            return None
        mcs = p[i]
        i += 1
        if not 2 <= mcs <= 11:
            return None
        parts = []
        while i < len(p) and p[i] != 0:
            ln = p[i]
            parts.append(p[i + 1:i + 1 + ln])
            i += 1 + ln
        if i >= len(p):
            return None
        idx = _lzw_decode(b"".join(parts), mcs, fw * fh)
        if idx is None or len(idx) < fw * fh:
            return None
        a = np.frombuffer(idx, dtype=np.uint8).reshape(fh, fw)
        if lf & 0x40:  # interlaced: rows arrive in the 4 GIF passes
            order = np.concatenate([
                np.arange(0, fh, 8), np.arange(4, fh, 8),
                np.arange(2, fh, 4), np.arange(1, fh, 2)])
            rows = np.empty_like(a)
            rows[order] = a
            a = rows
        if int(a.max(initial=0)) >= len(pal):
            return None
        bg_rgb = (gpal[bg_idx].astype(np.float64)
                  if gpal is not None and bg_idx < len(gpal)
                  else np.zeros(3))
        rgb = pal[a.reshape(-1)].astype(np.float64)
        if transparent is not None:
            rgb[a.reshape(-1) == transparent] = bg_rgb
        if pixels:
            screen = np.empty((sh, sw, 3), dtype=np.uint8)
            screen[:] = np.round(bg_rgb).astype(np.uint8)
            screen[fy:fy + fh, fx:fx + fw] = \
                np.round(rgb).astype(np.uint8).reshape(fh, fw, 3)
            return screen
        frame_sum = float((rgb @ _LUMA_W).sum())
        bg_luma = float(bg_rgb @ _LUMA_W)
        total = frame_sum + bg_luma * (sw * sh - fw * fh)
        return int(sw), int(sh), total / (sw * sh) / 255.0
    return None


def decode_image(p: bytes):
    """REAL pure-NumPy decode — PNG (stdlib-zlib inflate + numpy
    unfiltering: every legal IHDR — depths 1/2/4/8/16,
    gray/RGB/palette/gray+alpha/RGBA, non-interlaced and Adam7),
    GIF first frame (pure-Python LZW + palette/interlace/transparency),
    JPEG — all four entropy/scan modes: Huffman + arithmetic,
    sequential + progressive (marker/DQT/DHT/DAC parse,
    canonical-Huffman or QM-coder entropy decode, luma-plane IDCT —
    :mod:`.jpeg` / :mod:`.jpeg_arith`),
    lossless WebP
    (full VP8L: LZ77 + color cache + all four transforms —
    :mod:`.vp8l`), binary netpbm (P5/P6), uncompressed 8/24-bit BMP and
    baseline TIFF (8-bit gray/RGB/RGBA strips, uncompressed or
    PackBits, both byte orders).
    Returns (width, height, mean_luma in [0,1]) or None when the
    payload needs an external codec (lossy VP8 / ...)."""
    import struct
    png = _decode_png(p)
    if png is not None:
        return png
    gif = _decode_gif(p)
    if gif is not None:
        return gif
    if len(p) >= 2 and p[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg
        jp = decode_jpeg(p)
        if jp is not None:
            return jp
    if len(p) >= 12 and p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        from .vp8l import decode_webp
        wp = decode_webp(p)     # lossless VP8L; lossy VP8 stays None
        if wp is not None:
            return wp
    if len(p) >= 2 and p[:2] in (b"P5", b"P6"):
        hdr = _parse_pnm_header(p)
        if hdr is None:
            return None
        w, h, maxval, off = hdr
        ch = 1 if p[:2] == b"P5" else 3
        need = w * h * ch * (2 if maxval > 255 else 1)
        if maxval <= 0 or len(p) - off < need:
            return None
        dt = np.dtype(">u2") if maxval > 255 else np.uint8
        px = np.frombuffer(p, dtype=dt, count=w * h * ch,
                           offset=off).astype(np.float64) / maxval
        if ch == 3:
            px = px.reshape(-1, 3) @ np.array([0.299, 0.587, 0.114])
        return w, h, float(px.mean())
    if len(p) >= 54 and p[:2] == b"BM":
        data_off = struct.unpack("<I", p[10:14])[0]
        w, hraw = struct.unpack("<ii", p[18:26])
        bpp, comp = struct.unpack("<HI", p[28:34])
        h = abs(hraw)
        if comp != 0 or bpp not in (8, 24) or w <= 0 or h == 0:
            return None
        stride = (w * bpp // 8 + 3) & ~3
        if len(p) - data_off < stride * h:
            return None
        rows = np.frombuffer(p, dtype=np.uint8, count=stride * h,
                             offset=data_off).reshape(h, stride)
        if bpp == 24:
            bgr = rows[:, : w * 3].reshape(h, w, 3).astype(np.float64)
            luma = (bgr @ np.array([0.114, 0.587, 0.299])).mean() / 255.0
        else:
            luma = float(rows[:, :w].mean()) / 255.0
        return w, h, float(luma)
    return _decode_tiff(p)


def _packbits_inflate(b: bytes) -> bytearray:
    """PackBits (TIFF 6.0 §9) run-length inflate — per-strip."""
    out = bytearray()
    i = 0
    while i < len(b):
        n = b[i]
        i += 1
        if n < 128:                     # literal run of n+1 bytes
            out += b[i:i + n + 1]
            i += n + 1
        elif n > 128:                   # repeat next byte 257-n times
            if i >= len(b):
                break
            out += bytes([b[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per spec
    return out


def _lzw_inflate_tiff(b: bytes) -> bytearray:
    """TIFF-LZW inflate (TIFF 6.0 §13): MSB-first codes, 9→12-bit
    widths with the conventional early change, Clear=256, EOI=257."""
    out = bytearray()
    n = len(b) * 8
    bitpos = 0
    table: list[bytes] = []
    width = 9
    prev = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while bitpos + width <= n:
        byte = bitpos >> 3
        chunk = b[byte:byte + 3]
        v = int.from_bytes(chunk + b"\0" * (3 - len(chunk)), "big")
        code = (v >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == 256:
            reset()
            continue
        if code == 257:
            break
        if prev is None:
            if code > 255:
                break                   # first code must be a literal
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            break                       # corrupt stream
        out += entry
        prev = entry
        # early change, lag-adjusted: the decoder's table trails the
        # encoder's by one entry, so bump one entry sooner than the
        # non-early formula (len+2 == 2^width <=> encoder just wrote
        # entry 2^width - 2 and switches widths for its next code)
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    return out


def _decode_tiff(p: bytes, pixels: bool = False):
    """REAL baseline-TIFF decode (TIFF 6.0 subset: first IFD, chunky
    PlanarConfig, 8-bit gray / RGB / RGBA, strip layout, uncompressed
    or PackBits, both byte orders).  Returns the decode_image /
    decode_image_pixels contract, or None outside the subset."""
    import struct
    if len(p) < 8 or p[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    bo = "<" if p[:2] == b"II" else ">"

    def u16(off):
        return struct.unpack_from(bo + "H", p, off)[0]

    def u32(off):
        return struct.unpack_from(bo + "I", p, off)[0]

    ifd = u32(4)
    if ifd + 2 > len(p):
        return None
    n = u16(ifd)
    if ifd + 2 + 12 * n > len(p):
        return None
    tags = {}
    for i in range(n):
        e = ifd + 2 + 12 * i
        tag, typ = u16(e), u16(e + 2)
        cnt = u32(e + 4)
        size = {3: 2, 4: 4}.get(typ)    # SHORT / LONG only
        if size is None or cnt == 0 or cnt > 1 << 20:
            continue
        total = size * cnt
        voff = e + 8 if total <= 4 else u32(e + 8)
        if voff + total > len(p):
            return None
        tags[tag] = [u16(voff + size * j) if typ == 3
                     else u32(voff + size * j) for j in range(cnt)]
    if not all(t in tags for t in (256, 257, 273, 279)):
        return None
    w, h = tags[256][0], tags[257][0]
    offs, counts = tags[273], tags[279]
    comp = tags.get(259, [1])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8])
    planar = tags.get(284, [1])[0]
    predictor = tags.get(317, [1])[0]
    if comp not in (1, 5, 8, 32946, 32773) or spp not in (1, 3, 4) \
            or planar != 1 or predictor not in (1, 2) \
            or any(b != 8 for b in bps) or w <= 0 or h <= 0 \
            or w * h > 64_000_000 or len(offs) != len(counts):
        return None
    raw = bytearray()
    for o, c in zip(offs, counts):
        if o + c > len(p):
            return None
        strip = p[o:o + c]
        if comp == 32773:
            raw += _packbits_inflate(strip)
        elif comp == 5:
            raw += _lzw_inflate_tiff(strip)
        elif comp in (8, 32946):        # Deflate / legacy Deflate
            import zlib
            try:
                raw += zlib.decompress(strip)
            except zlib.error:
                return None
        else:
            raw += strip
    need = w * h * spp
    if len(raw) < need:
        return None
    a = np.frombuffer(bytes(raw[:need]), dtype=np.uint8)
    a = a.reshape(h, w, spp)
    if predictor == 2:                  # horizontal differencing
        a = np.cumsum(a.astype(np.uint64), axis=1).astype(np.uint8)
    if spp == 1:
        a = a[:, :, 0]
    elif spp == 4:
        a = a[:, :, :3]                 # drop alpha, like the PNG path
    if pixels:
        return np.ascontiguousarray(a)
    if a.ndim == 3:
        luma = float((a.reshape(-1, 3).astype(np.float64)
                      @ np.array([0.299, 0.587, 0.114])).mean()) / 255.0
    else:
        luma = float(a.mean()) / 255.0
    return w, h, luma


def decode_image_pixels(p: bytes):
    """FULL pixel decode across the same codec subset as
    :func:`decode_image`: uint8 (H, W) gray or (H, W, 3) RGB for PNG,
    GIF first frame, baseline Huffman JPEG (chroma IDCT + BT.601
    YCbCr→RGB, :func:`..jpeg.decode_jpeg_pixels`), lossless WebP
    (:func:`..vp8l.decode_webp_pixels`), binary netpbm,
    uncompressed BMP (rows returned top-down) and baseline TIFF
    (uncompressed/PackBits strips); 16-bit netpbm is scaled
    to 8.  None outside the subset."""
    import struct
    px = _decode_png(p, pixels=True)
    if px is not None:
        return px
    px = _decode_gif(p, pixels=True)
    if px is not None:
        return px
    if len(p) >= 2 and p[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_pixels
        px = decode_jpeg_pixels(p)
        if px is not None:
            return px
    if len(p) >= 12 and p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        from .vp8l import decode_webp_pixels
        px = decode_webp_pixels(p)
        if px is not None:
            return px
    if len(p) >= 2 and p[:2] in (b"P5", b"P6"):
        hdr = _parse_pnm_header(p)
        if hdr is None:
            return None
        w, h, maxval, off = hdr
        ch = 1 if p[:2] == b"P5" else 3
        need = w * h * ch * (2 if maxval > 255 else 1)
        if maxval <= 0 or len(p) - off < need:
            return None
        dt = np.dtype(">u2") if maxval > 255 else np.uint8
        px = np.frombuffer(p, dtype=dt, count=w * h * ch, offset=off)
        px = np.round(px.astype(np.float64) * (255.0 / maxval))
        px = px.astype(np.uint8)
        return px.reshape(h, w, 3) if ch == 3 else px.reshape(h, w)
    if len(p) >= 54 and p[:2] == b"BM":
        data_off = struct.unpack("<I", p[10:14])[0]
        w, hraw = struct.unpack("<ii", p[18:26])
        bpp, comp = struct.unpack("<HI", p[28:34])
        h = abs(hraw)
        if comp != 0 or bpp not in (8, 24) or w <= 0 or h == 0:
            return None
        stride = (w * bpp // 8 + 3) & ~3
        if len(p) - data_off < stride * h:
            return None
        rows = np.frombuffer(p, dtype=np.uint8, count=stride * h,
                             offset=data_off).reshape(h, stride)
        if hraw > 0:        # bottom-up storage → top-down pixels
            rows = rows[::-1]
        if bpp == 24:
            return np.ascontiguousarray(
                rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1])
        return np.ascontiguousarray(rows[:, :w])
    return _decode_tiff(p, pixels=True)


class ImageDecoder:
    """Actor-pool decode/feature stage.

    real=True decodes the formats a pure-NumPy + stdlib decoder can
    handle — PNG at every legal IHDR shape (zlib inflate + unfiltering,
    depths 1-16, Adam7), GIF
    first frame (LZW), JPEG — Huffman sequential + progressive AND
    arithmetic-coded SOF9/SOF10 (QM coder, :mod:`.jpeg_arith`) —
    lossless WebP (full VP8L, :mod:`.vp8l`), binary netpbm (P5/P6),
    uncompressed 8/24-bit BMP and baseline TIFF (uncompressed /
    PackBits) — via :func:`decode_image`, and raises
    NotImplementedError per payload for the remaining codecs
    (lossy VP8 needs PIL/opencv, not installed
    here; that boundary is the ONLY stubbed part).
    real=False emits a deterministic fake (width, height, mean_luma)
    derived from the payload's sha256 — stable across runs, exercising
    the full Ray plumbing when no decodable payloads exist.

    rgb_stats=True runs the FULL pixel decode (:func:`decode_image_pixels`
    — chroma IDCT for JPEG, composed screens for GIF) and adds
    mean_r/mean_g/mean_b columns; every stat then derives from the one
    pixel array (grayscale payloads report r=g=b=gray, and mean_luma is
    the BT.601 dot product of the channel means).
    """

    def __init__(self, real: bool = False, rgb_stats: bool = False):
        self.real = real
        self.rgb_stats = rgb_stats

    def _unsupported(self, p: bytes):
        fmt = _parse_image_dims(p)[0] or "unknown"
        raise NotImplementedError(
            f"decoding '{fmt}' payloads needs PIL/opencv "
            "(unavailable in this environment); only PNG, GIF, "
            "JPEG, lossless WebP, netpbm, BMP and baseline TIFF "
            "decode without external codecs")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n = len(payloads)
        w = np.empty(n, dtype=np.int32)
        h = np.empty(n, dtype=np.int32)
        luma = np.empty(n, dtype=np.float64)
        rgb = np.empty((n, 3), dtype=np.float64) if self.rgb_stats else None
        for i, p in enumerate(payloads):
            p = p or b""
            if self.real and self.rgb_stats:
                px = decode_image_pixels(p)
                if px is None:
                    self._unsupported(p)
                h[i], w[i] = px.shape[:2]
                rgb[i] = (px.reshape(-1, 3).mean(axis=0) / 255.0
                          if px.ndim == 3 else px.mean() / 255.0)
                luma[i] = float(rgb[i] @ _LUMA_W)
            elif self.real:
                dec = decode_image(p)
                if dec is None:
                    self._unsupported(p)
                w[i], h[i], luma[i] = dec
            else:
                d = hashlib.sha256(p).digest()
                w[i] = 64 + d[0] * 4
                h[i] = 64 + d[1] * 4
                luma[i] = d[2] / 255.0
                if rgb is not None:
                    rgb[i] = [d[3] / 255.0, d[4] / 255.0, d[5] / 255.0]
        batch = set_column(batch, "width", pa.array(w))
        batch = set_column(batch, "height", pa.array(h))
        batch = set_column(batch, "mean_luma", pa.array(luma))
        if rgb is not None:
            for j, name in enumerate(("mean_r", "mean_g", "mean_b")):
                batch = set_column(batch, name, pa.array(rgb[:, j]))
        return batch


# IMA/DVI ADPCM constants (public IMA "Recommended Practices for
# Enhancing Digital Audio Compatibility" / RFC 3551 app-profile tables)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int64)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_step(pred, idx, nib):
    """One IMA ADPCM step, vectorized across parallel block streams:
    (predictor, step-index, nibble) arrays → updated (predictor,
    index).  The feedback loop runs per sample; numpy runs per block."""
    step = _IMA_STEPS[idx]
    vpdiff = (step >> 3) + np.where(nib & 4, step, 0) \
        + np.where(nib & 2, step >> 1, 0) + np.where(nib & 1, step >> 2, 0)
    pred = np.where(nib & 8, pred - vpdiff, pred + vpdiff)
    pred = np.clip(pred, -32768, 32767)
    idx = np.clip(idx + _IMA_INDEX[nib & 7], 0, 88)
    return pred, idx


def _decode_ima_adpcm(body: bytes, nch: int, block_align: int):
    """IMA ADPCM 'data' payload → int16 interleaved samples.  Blocks are
    independent, so the sequential predictor loop is vectorized ACROSS
    blocks (numpy lane per block) — per-sample Python cost is O(samples
    per block), not O(total samples)."""
    if block_align < 4 * nch or block_align % 4:
        return None
    nblk = len(body) // block_align
    if nblk == 0:
        return None
    raw = np.frombuffer(body[:nblk * block_align],
                        dtype=np.uint8).reshape(nblk, block_align)
    spb = (block_align - 4 * nch) * 2 // nch   # data samples/chan/block
    out = np.empty((nblk, spb + 1, nch), dtype=np.int16)
    preds = []
    idxs = []
    for c in range(nch):
        hdr = raw[:, 4 * c:4 * c + 4]
        pred = (hdr[:, 0].astype(np.int64)
                | hdr[:, 1].astype(np.int64) << 8)
        pred = np.where(pred >= 1 << 15, pred - (1 << 16), pred)
        idx = np.clip(hdr[:, 2].astype(np.int64), 0, 88)
        out[:, 0, c] = pred
        preds.append(pred)
        idxs.append(idx)
    # after the headers, nibbles come in 4-byte-per-channel groups of
    # 8 samples; even nibble (low) first
    data = raw[:, 4 * nch:]
    for t in range(spb):
        grp, within = divmod(t, 8)
        for c in range(nch):
            byte = data[:, grp * 4 * nch + 4 * c + within // 2]
            nib = ((byte >> 4) if within % 2 else (byte & 0x0F)) \
                .astype(np.int64)
            preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
            out[:, t + 1, c] = preds[c]
    return out.reshape(-1)


def _mulaw_expand(u: np.ndarray) -> np.ndarray:
    u = (~u) & 0xFF
    sign = u >> 7
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) | 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int64)


def _alaw_expand(a: np.ndarray) -> np.ndarray:
    a = (a ^ 0x55) & 0xFF
    sign = a >> 7
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << (exp - 1))
    return np.where(sign, -mag, mag).astype(np.int64)


def decode_wav(p: bytes):
    """REAL pure-NumPy decode of RIFF/WAVE payloads — PCM 8/16/24/32-bit,
    IEEE float32/64, A-law / µ-law (G.711 expansion tables) and IMA/DVI
    ADPCM (block-vectorized predictor loop).  Returns (sample_rate,
    n_channels, samples) with samples as float64 in [-1, 1]
    (channel-interleaved, flattened), or None when the payload needs a
    real codec library (mp3/ogg/flac)."""
    import struct
    if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    fmt = None
    i = 12
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        size = struct.unpack("<I", p[i + 4:i + 8])[0]
        body = p[i + 8:i + 8 + size]
        if cid == b"fmt " and size >= 16:
            tag, nch, sr, _br, ba, bits = struct.unpack("<HHIIHH",
                                                        body[:16])
            fmt = (tag, nch, sr, bits, ba)
        elif cid == b"data" and fmt is not None:
            tag, nch, sr, bits, ba = fmt
            if nch == 0 or sr == 0:
                return None
            if tag == 1 and bits == 8:        # PCM unsigned 8-bit
                s = (np.frombuffer(body, dtype=np.uint8)
                     .astype(np.float64) - 128.0) / 128.0
            elif tag == 1 and bits == 16:
                s = np.frombuffer(
                    body[: len(body) & ~1], dtype="<i2"
                ).astype(np.float64) / 32768.0
            elif tag == 1 and bits == 24:
                raw = np.frombuffer(body[: len(body) - len(body) % 3],
                                    dtype=np.uint8).reshape(-1, 3)
                v = (raw[:, 0].astype(np.int32)
                     | raw[:, 1].astype(np.int32) << 8
                     | raw[:, 2].astype(np.int32) << 16)
                v = np.where(v >= 1 << 23, v - (1 << 24), v)
                s = v.astype(np.float64) / float(1 << 23)
            elif tag == 1 and bits == 32:
                s = np.frombuffer(
                    body[: len(body) & ~3], dtype="<i4"
                ).astype(np.float64) / float(1 << 31)
            elif tag == 3 and bits == 32:     # IEEE float
                s = np.frombuffer(body[: len(body) & ~3],
                                  dtype="<f4").astype(np.float64)
            elif tag == 3 and bits == 64:
                s = np.frombuffer(body[: len(body) & ~7],
                                  dtype="<f8").copy()
            elif tag == 6 and bits == 8:      # A-law
                s = _alaw_expand(np.frombuffer(body, dtype=np.uint8)
                                 .astype(np.int64)) / 32768.0
            elif tag == 7 and bits == 8:      # µ-law
                s = _mulaw_expand(np.frombuffer(body, dtype=np.uint8)
                                  .astype(np.int64)) / 32768.0
            elif tag == 0x11 and bits == 4:   # IMA/DVI ADPCM
                dec = _decode_ima_adpcm(body, nch, ba)
                if dec is None:
                    return None
                s = dec.astype(np.float64) / 32768.0
            else:
                return None                   # compressed / exotic tag
            return sr, nch, s
        i += 8 + size + (size & 1)            # chunks are 2-byte aligned
    return None


def _f80_to_float(b: bytes) -> float:
    """80-bit IEEE 754 extended (the AIFF COMM sample rate) → float."""
    import struct
    se = struct.unpack(">H", b[:2])[0]
    mant = int.from_bytes(b[2:10], "big")
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    sign = -1.0 if se & 0x8000 else 1.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def decode_aiff(p: bytes):
    """REAL AIFF (FORM/AIFF) decode — big-endian PCM 8/16/24/32 (AIFF
    8-bit is SIGNED, unlike WAV), COMM 80-bit-extended sample rate,
    SSND offset honoured.  Same contract as :func:`decode_wav`; None
    for AIFC compression variants."""
    import struct
    if len(p) < 12 or p[:4] != b"FORM" or p[8:12] != b"AIFF":
        return None
    comm = ssnd = None
    i = 12
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        size = struct.unpack(">I", p[i + 4:i + 8])[0]
        body = p[i + 8:i + 8 + size]
        if cid == b"COMM" and size >= 18:
            nch, nframes, bits = struct.unpack(">HIH", body[:8])
            comm = (nch, nframes, bits, _f80_to_float(body[8:18]))
        elif cid == b"SSND" and size >= 8:
            off = struct.unpack(">I", body[:4])[0]
            ssnd = body[8 + off:]
        i += 8 + size + (size & 1)
    if comm is None or ssnd is None:
        return None
    nch, nframes, bits, sr = comm
    if not nch or sr <= 0 or bits not in (8, 16, 24, 32):
        return None
    nb = bits // 8
    ssnd = ssnd[: (len(ssnd) // nb) * nb]
    if bits == 8:
        s = np.frombuffer(ssnd, dtype=np.int8).astype(np.float64) / 128.0
    elif bits == 16:
        s = np.frombuffer(ssnd, dtype=">i2").astype(np.float64) / 32768.0
    elif bits == 32:
        s = np.frombuffer(ssnd, dtype=">i4").astype(np.float64) \
            / float(1 << 31)
    else:                               # 24-bit big-endian
        raw = np.frombuffer(ssnd, dtype=np.uint8).reshape(-1, 3)
        v = (raw[:, 0].astype(np.int32) << 16
             | raw[:, 1].astype(np.int32) << 8 | raw[:, 2])
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        s = v.astype(np.float64) / float(1 << 23)
    s = s[: nframes * nch]
    return int(round(sr)), nch, s


def decode_au(p: bytes):
    """REAL Sun AU (.snd) decode — big-endian µ-law / A-law / signed
    PCM 8/16/24/32 / float32/64.  Same contract as
    :func:`decode_wav`."""
    import struct
    if len(p) < 24 or p[:4] != b".snd":
        return None
    off, size, enc, sr, nch = struct.unpack(">IIIII", p[4:24])
    if off < 24 or off > len(p) or sr == 0 or nch == 0:
        return None
    end = len(p) if size == 0xFFFFFFFF else min(len(p), off + size)
    body = p[off:end]
    if enc == 1:
        s = _mulaw_expand(np.frombuffer(body, dtype=np.uint8)
                          .astype(np.int64)) / 32768.0
    elif enc == 27:
        s = _alaw_expand(np.frombuffer(body, dtype=np.uint8)
                         .astype(np.int64)) / 32768.0
    elif enc == 2:
        s = np.frombuffer(body, dtype=np.int8).astype(np.float64) / 128.0
    elif enc == 3:
        s = np.frombuffer(body[: len(body) & ~1],
                          dtype=">i2").astype(np.float64) / 32768.0
    elif enc == 4:
        raw = np.frombuffer(body[: len(body) - len(body) % 3],
                            dtype=np.uint8).reshape(-1, 3)
        v = (raw[:, 0].astype(np.int32) << 16
             | raw[:, 1].astype(np.int32) << 8 | raw[:, 2])
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        s = v.astype(np.float64) / float(1 << 23)
    elif enc == 5:
        s = np.frombuffer(body[: len(body) & ~3],
                          dtype=">i4").astype(np.float64) / float(1 << 31)
    elif enc == 6:
        s = np.frombuffer(body[: len(body) & ~3],
                          dtype=">f4").astype(np.float64)
    elif enc == 7:
        s = np.frombuffer(body[: len(body) & ~7], dtype=">f8").copy()
    else:
        return None                     # ADPCM variants: out of subset
    return sr, nch, s


_AU_BYTES_PER = {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4, 7: 8, 27: 1}


# MPEG audio frame-header tables (public ISO/IEC 11172-3 / 13818-3):
# bitrate kbps by [version][layer][index]; sample rate by [version][index];
# version ids: 0=MPEG2.5, 2=MPEG2, 3=MPEG1 (1 reserved)
_MP3_BITRATE = {
    (3, 3): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448],                                  # V1 L1
    (3, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320, 384],                                  # V1 L2
    (3, 1): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
             224, 256, 320],                                  # V1 L3
    (2, 3): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
             192, 224, 256],                                  # V2 L1
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
             128, 144, 160],                                  # V2 L2/L3
}
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}


def mp3_duration(p: bytes):
    """REAL MPEG-audio (mp3/mp2/mp1) duration from a frame-header walk
    — bitrate/samplerate table math per the public ISO 11172-3 header
    layout, no decoder.  Skips a leading ID3v2 tag, sums
    samples-per-frame over every frame (so VBR streams are exact).
    Returns (sample_rate, n_channels, duration_s) or None."""
    i = 0
    if p[:3] == b"ID3" and len(p) >= 10:
        i = 10 + (((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14)
                  | ((p[8] & 0x7F) << 7) | (p[9] & 0x7F))
    frames = samples = sr_out = nch = 0
    while i + 4 <= len(p):
        h = int.from_bytes(p[i:i + 4], "big")
        ver = (h >> 19) & 3
        layer = (h >> 17) & 3
        br_i = (h >> 12) & 15
        sr_i = (h >> 10) & 3
        if (h >> 21) != 0x7FF or ver == 1 or layer == 0 \
                or br_i in (0, 15) or sr_i == 3:
            if frames:
                break          # trailing tag/garbage after valid frames
            i += 1             # resync scan before the first frame
            continue
        sr = _MP3_RATES[ver][sr_i]
        # MPEG2/2.5 Layers II and III share one bitrate table
        tbl = (3, layer) if ver == 3 else (2, 3 if layer == 3 else 2)
        br = _MP3_BITRATE[tbl][br_i] * 1000
        pad = (h >> 9) & 1
        if layer == 3:                       # Layer I
            spf, flen = 384, (12 * br // sr + pad) * 4
        elif layer == 2 or ver == 3:         # Layer II, or MPEG1 L3
            spf, flen = 1152, 144 * br // sr + pad
        else:                                # MPEG2/2.5 Layer III
            spf, flen = 576, 72 * br // sr + pad
        frames += 1
        samples += spf
        sr_out = sr
        nch = 1 if (h >> 6) & 3 == 3 else 2
        i += max(flen, 4)
    if not frames:
        return None
    return sr_out, nch, samples / sr_out


def ogg_duration(p: bytes):
    """REAL Ogg container duration — page walk (capture pattern,
    segment-table sizes) to the last granule position, codec rate from
    the first packet's ident header ('\\x01vorbis' or 'OpusHead'); no
    codec library.  Returns (sample_rate, n_channels, duration_s) or
    None.  Layouts per the public RFC 3533 / Vorbis I / RFC 7845
    specs."""
    i = 0
    rate = nch = 0
    gran_rate = 0           # granules/sec: vorbis = rate, opus = 48000
    pre_skip = 0
    last_gran = -1
    first = True
    while i + 27 <= len(p):
        if p[i:i + 4] != b"OggS" or p[i + 4] != 0:
            if first:
                return None
            break              # trailing garbage after valid pages
        gran = int.from_bytes(p[i + 6:i + 14], "little", signed=True)
        nseg = p[i + 26]
        segs = p[i + 27:i + 27 + nseg]
        if len(segs) < nseg:
            return None
        body_off = i + 27 + nseg
        body_len = int(sum(segs))
        if body_off + body_len > len(p):
            return None
        if first:
            body = p[body_off:body_off + body_len]
            if body[:7] == b"\x01vorbis" and len(body) >= 16:
                nch = body[11]
                rate = int.from_bytes(body[12:16], "little")
                gran_rate = rate
            elif body[:8] == b"OpusHead" and len(body) >= 16:
                nch = body[9]
                pre_skip = int.from_bytes(body[10:12], "little")
                rate = int.from_bytes(body[12:16], "little")
                gran_rate = 48000
            else:
                return None
            first = False
        if gran >= 0:
            last_gran = max(last_gran, gran)
        i = body_off + body_len
    if first or not gran_rate or last_gran < 0:
        return None
    return rate, nch, max(0, last_gran - pre_skip) / gran_rate


def _wav_meta(p: bytes):
    """(sample_rate, n_channels, duration_s) from RIFF/WAVE chunk
    headers alone — no sample decode."""
    import struct
    if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    fmt = None
    i = 12
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        size = struct.unpack("<I", p[i + 4:i + 8])[0]
        if cid == b"fmt " and size >= 16:
            tag, nch, sr, _br, ba, bits = struct.unpack(
                "<HHIIHH", p[i + 8:i + 24])
            fmt = (tag, nch, sr, bits, ba)
        elif cid == b"data" and fmt is not None:
            tag, nch, sr, bits, ba = fmt
            if not nch or not sr:
                return None
            if tag == 0x11:          # IMA ADPCM: samples/block formula
                if ba < 4 * nch or ba % 4:
                    return None
                spb = (ba - 4 * nch) * 2 // nch + 1
                n = (size // ba) * spb
            else:
                bytes_per = max(1, bits // 8) * nch
                n = size // bytes_per
            return sr, nch, n / sr
        i += 8 + size + (size & 1)
    return None


def audio_meta_batch(batch: pa.Table,
                     payload_col: str = "payload") -> pa.Table:
    """Append (format, sample_rate, n_channels, duration_s) parsed from
    the binary payload's container/frame headers — the pre-decode
    filter every audio pipeline wants BEFORE shipping payloads to
    expensive decoders (the audio analogue of
    :func:`image_dims_batch`).  Fully real for wav (chunk headers),
    flac (STREAMINFO), aiff (COMM), au (.snd header), mp3 (frame walk)
    and ogg vorbis/opus (page walk): header math, no codec library.  Unknown payloads get
    format=None, -1/-1/NaN."""
    from .flac import parse_streaminfo
    payloads = batch.column(payload_col).to_pylist()
    fmts, srs, nchs, durs = [], [], [], []
    for p in payloads:
        p = p or b""
        fmt, meta = None, None
        if p[:4] == b"RIFF":
            fmt, meta = "wav", _wav_meta(p)
        elif p[:4] == b"FORM" and p[8:12] == b"AIFF":
            fmt = "aiff"
            dec = decode_aiff(p)
            if dec is not None:
                sr_, nch_, s_ = dec
                meta = (sr_, nch_, len(s_) / nch_ / sr_)
        elif p[:4] == b".snd":
            fmt = "au"
            if len(p) >= 24:
                import struct
                off, size, enc, sr_, nch_ = struct.unpack(
                    ">IIIII", p[4:24])
                bp = _AU_BYTES_PER.get(enc)
                if bp and sr_ and nch_ and off <= len(p):
                    end = (len(p) if size == 0xFFFFFFFF
                           else min(len(p), off + size))
                    n = (end - off) // bp // nch_
                    meta = (sr_, nch_, n / sr_)
        elif p[:4] == b"fLaC":
            si = parse_streaminfo(p)
            if si and si[0]:
                meta = (si[0], si[1], si[3] / si[0])
            fmt = "flac"
        elif p[:4] == b"OggS":
            fmt, meta = "ogg", ogg_duration(p)
        elif p[:3] == b"ID3" or (len(p) >= 2 and p[0] == 0xFF
                                 and p[1] & 0xE0 == 0xE0):
            fmt, meta = "mp3", mp3_duration(p)
        if meta is None:
            fmts.append(fmt)
            srs.append(-1)
            nchs.append(-1)
            durs.append(float("nan"))
        else:
            fmts.append(fmt)
            srs.append(meta[0])
            nchs.append(meta[1])
            durs.append(meta[2])
    batch = set_column(batch, "format", pa.array(fmts, type=pa.string()))
    batch = set_column(batch, "sample_rate",
                       pa.array(srs, type=pa.int32()))
    batch = set_column(batch, "n_channels",
                       pa.array(nchs, type=pa.int32()))
    batch = set_column(batch, "duration_s",
                       pa.array(durs, type=pa.float64()))
    return batch


class AudioFeaturizer:
    """Actor-pool audio feature stage.

    real=True decodes RIFF/WAVE payloads (PCM, IEEE float, G.711
    A-law/µ-law, IMA ADPCM) with :func:`decode_wav`, native FLAC
    (CONSTANT/VERBATIM/FIXED/LPC subframes, rice residuals, stereo
    decorrelation — :mod:`.flac`), AIFF (:func:`decode_aiff`) and Sun
    AU (:func:`decode_au`) — no codec library needed — emitting real
    ``duration_s`` and ``rms``; the remaining transform codecs
    (mp3/ogg) raise NotImplementedError per payload (torchaudio/ffmpeg
    are not in this environment; that boundary is the only stubbed
    part).
    real=False emits a deterministic sha256-derived fake so the Ray
    plumbing is exercised when no decodable payloads exist."""

    def __init__(self, real: bool = False):
        self.real = real

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        dur = np.empty(len(payloads), dtype=np.float64)
        rms = np.empty(len(payloads), dtype=np.float64)
        for i, p in enumerate(payloads):
            if self.real:
                dec = decode_wav(p or b"")
                if dec is None:
                    from .flac import decode_flac
                    dec = decode_flac(p or b"")
                if dec is None:
                    dec = decode_aiff(p or b"")
                if dec is None:
                    dec = decode_au(p or b"")
                if dec is None:
                    raise NotImplementedError(
                        "only RIFF/WAVE, native FLAC, AIFF and Sun AU "
                        "decode without codec libraries (mp3/ogg need "
                        "torchaudio/ffmpeg, unavailable here)")
                sr, nch, s = dec
                dur[i] = len(s) / nch / sr
                rms[i] = float(np.sqrt(np.mean(s * s))) if len(s) else 0.0
            else:
                d = hashlib.sha256(b"a" + (p or b"")).digest()
                dur[i] = 0.5 + d[0] / 16.0
                rms[i] = d[1] / 255.0
        batch = set_column(batch, "duration_s", pa.array(dur))
        batch = set_column(batch, "rms", pa.array(rms))
        return batch


def gif_frame_timestamps(p: bytes):
    """REAL animated-GIF timeline parse — block walk, no codec library:
    returns the start timestamp (seconds) of every frame, from the
    Graphic Control Extension delay preceding each image descriptor
    (delay 0 rendered as the conventional 0.1 s).  None if not a GIF or
    structurally malformed."""
    if len(p) < 13 or p[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    import struct
    flags = p[10]
    i = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)

    def skip_subblocks(j: int) -> int:
        while j < len(p) and p[j] != 0:
            j += 1 + p[j]
        return j + 1

    ts, t, delay = [], 0.0, 0.1
    while i < len(p):
        b = p[i]
        if b == 0x3B:                       # trailer
            return ts
        if b == 0x21 and i + 1 < len(p):    # extension
            if p[i + 1] == 0xF9 and i + 6 <= len(p) and p[i + 2] >= 4:
                d = struct.unpack("<H", p[i + 4:i + 6])[0]
                delay = (d or 10) / 100.0
            i = skip_subblocks(i + 2)
        elif b == 0x2C:                     # image descriptor = one frame
            if i + 10 > len(p):
                return None
            ts.append(t)
            t += delay
            delay = 0.1
            lf = p[i + 9]
            i += 10 + (3 * (2 << (lf & 7)) if lf & 0x80 else 0)
            if i >= len(p):
                return None
            i = skip_subblocks(i + 1)       # skip LZW min-code + data
        else:
            return None
    return ts if ts else None


def _riff_children(p: bytes, start: int, end: int):
    """Yield (fourcc, data_offset, data_len) for each RIFF sub-chunk in
    p[start:end]; chunks are padded to even lengths (RIFF spec)."""
    i = start
    while i + 8 <= end:
        tag = p[i:i + 4]
        ln = int.from_bytes(p[i + 4:i + 8], "little")
        if i + 8 + ln > end:
            return
        yield tag, i + 8, ln
        i += 8 + ln + (ln & 1)


def parse_avi(p: bytes):
    """REAL AVI (RIFF) container parse — no codec library.  Walks
    LIST('hdrl') for the main header (avih) and the first video stream
    header (strh with fccType 'vids'), and LIST('movi') for the video
    frame chunks ('##dc'/'##db').  Returns
    ``{"width", "height", "handler", "scale", "rate", "frames":
    [(offset, length), ...]}`` or None if not an AVI / malformed.
    Frame i's timestamp is ``i * scale / rate`` seconds (falling back to
    avih's dwMicroSecPerFrame when strh carries no rate).  Reference:
    the public MSDN AVI RIFF file format (AVIMAINHEADER /
    AVISTREAMHEADER layouts)."""
    import struct
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    info = {"width": 0, "height": 0, "handler": b"", "scale": 0,
            "rate": 0, "frames": []}
    us_per_frame = 0
    for tag, off, ln in _riff_children(p, 12, min(len(p),
                                                  8 + int.from_bytes(
                                                      p[4:8], "little"))):
        if tag != b"LIST" or ln < 4:
            continue
        ltype = p[off:off + 4]
        if ltype == b"hdrl":
            for t2, o2, l2 in _riff_children(p, off + 4, off + ln):
                if t2 == b"avih" and l2 >= 40:
                    us_per_frame, = struct.unpack("<I", p[o2:o2 + 4])
                    info["width"], info["height"] = \
                        struct.unpack("<II", p[o2 + 32:o2 + 40])
                elif t2 == b"LIST" and p[o2:o2 + 4] == b"strl" \
                        and not info["handler"]:
                    for t3, o3, l3 in _riff_children(p, o2 + 4, o2 + l2):
                        if t3 == b"strh" and l3 >= 32 \
                                and p[o3:o3 + 4] == b"vids":
                            info["handler"] = p[o3 + 4:o3 + 8]
                            info["scale"], info["rate"] = \
                                struct.unpack("<II", p[o3 + 20:o3 + 28])
        elif ltype == b"movi":
            for t2, o2, l2 in _riff_children(p, off + 4, off + ln):
                if len(t2) == 4 and t2[2:] in (b"dc", b"db"):
                    info["frames"].append((o2, l2))
    if not info["frames"]:
        return None
    if not info["rate"] or not info["scale"]:
        # fall back to the main header's frame period
        info["scale"], info["rate"] = (us_per_frame or 40_000), 1_000_000
    return info


def avi_frame_timestamps(p: bytes):
    """Frame-start timestamps (seconds) of an AVI's video stream, or
    None if not an AVI — the container analogue of
    :func:`gif_frame_timestamps`."""
    info = parse_avi(p)
    if info is None:
        return None
    dt = info["scale"] / info["rate"]
    return [i * dt for i in range(len(info["frames"]))]


def avi_sample_frames(p: bytes, ts: list[float]):
    """Decode the MJPEG frames of an AVI nearest each timestamp in
    ``ts`` (which must come from :func:`avi_frame_timestamps` sampling).
    Returns a list of uint8 pixel arrays, or None when the stream is
    not MJPEG (a DIB/other-codec AVI still yields timestamps, but its
    frames need an external codec)."""
    info = parse_avi(p)
    if info is None:
        return None
    dt = info["scale"] / info["rate"]
    from .jpeg import decode_jpeg_pixels
    out = []
    for t in ts:
        off, ln = info["frames"][min(len(info["frames"]) - 1,
                                     max(0, round(t / dt)))]
        frame = p[off:off + ln]
        if not frame.startswith(b"\xff\xd8"):
            return None
        px = decode_jpeg_pixels(frame)
        if px is None:
            return None
        out.append(px)
    return out


def _mp4_boxes(p: bytes, start: int, end: int):
    """Yield (fourcc, body_offset, body_len) for each ISO-BMFF box in
    ``p[start:end]`` — 32-bit sizes, 64-bit largesize, and size==0
    (extends to end) all handled."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(p[i:i + 4], "big")
        typ = p[i + 4:i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(p[i + 8:i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            return
        yield typ, i + hdr, size - hdr
        i += size


def _mp4_child(p: bytes, off: int, ln: int, fourcc: bytes):
    for t, o, l in _mp4_boxes(p, off, off + ln):
        if t == fourcc:
            return o, l
    return None


def parse_mp4(p: bytes):
    """REAL MP4 / ISO-BMFF container parse — no codec library.  Box
    walk to the first video trak (hdlr 'vide'): mdhd timescale, stts
    decode deltas, stsd codec fourcc, and — when stsz/stsc/stco(co64)
    are all present — per-sample file offsets.  Returns
    ``{"timescale", "timestamps", "codec", "frames": [(off, len),...]}``
    or None if not ISO-BMFF / no video track.  Layouts per the public
    ISO/IEC 14496-12 spec."""
    if len(p) < 12 or p[4:8] not in (b"ftyp", b"styp", b"moov", b"free",
                                     b"skip", b"wide", b"mdat"):
        return None
    moov = _mp4_child(p, 0, len(p), b"moov")
    if moov is None:
        return None
    for t, o, l in _mp4_boxes(p, moov[0], moov[0] + moov[1]):
        if t != b"trak":
            continue
        mdia = _mp4_child(p, o, l, b"mdia")
        if mdia is None:
            continue
        hdlr = _mp4_child(p, *mdia, b"hdlr")
        if hdlr is None or p[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        mdhd = _mp4_child(p, *mdia, b"mdhd")
        minf = _mp4_child(p, *mdia, b"minf")
        stbl = minf and _mp4_child(p, *minf, b"stbl")
        stts = stbl and _mp4_child(p, *stbl, b"stts")
        if mdhd is None or stts is None:
            return None
        mo = mdhd[0]
        timescale = int.from_bytes(
            p[mo + 20:mo + 24] if p[mo] == 1 else p[mo + 12:mo + 16],
            "big")
        if timescale == 0:
            return None
        so, _sl = stts
        n_ent = int.from_bytes(p[so + 4:so + 8], "big")
        deltas = []
        for e in range(n_ent):
            cnt = int.from_bytes(p[so + 8 + 8 * e:so + 12 + 8 * e], "big")
            dl = int.from_bytes(p[so + 12 + 8 * e:so + 16 + 8 * e], "big")
            deltas.extend([dl] * cnt)
        if not deltas:
            return None
        ts = np.concatenate([[0.0], np.cumsum(deltas[:-1])]) / timescale
        codec = b""
        stsd = _mp4_child(p, *stbl, b"stsd")
        if stsd and int.from_bytes(p[stsd[0] + 4:stsd[0] + 8], "big"):
            codec = p[stsd[0] + 12:stsd[0] + 16]
        frames = _mp4_sample_spans(p, stbl, len(deltas))
        return {"timescale": timescale, "timestamps": ts.tolist(),
                "codec": codec, "frames": frames}
    return None


def _mp4_sample_spans(p: bytes, stbl, n: int):
    """[(file_offset, length)] per sample from stsz + stsc + stco/co64,
    or [] when any table is missing/inconsistent (timestamps still
    work without them)."""
    stsz = _mp4_child(p, *stbl, b"stsz")
    stsc = _mp4_child(p, *stbl, b"stsc")
    stco = _mp4_child(p, *stbl, b"stco")
    co64 = None if stco else _mp4_child(p, *stbl, b"co64")
    if stsz is None or stsc is None or (stco is None and co64 is None):
        return []
    zo = stsz[0]
    fixed = int.from_bytes(p[zo + 4:zo + 8], "big")
    cnt = int.from_bytes(p[zo + 8:zo + 12], "big")
    if cnt < n:
        return []
    sizes = [fixed] * n if fixed else [
        int.from_bytes(p[zo + 12 + 4 * i:zo + 16 + 4 * i], "big")
        for i in range(n)]
    co, wid = (stco[0], 4) if stco else (co64[0], 8)
    n_chunks = int.from_bytes(p[co + 4:co + 8], "big")
    offs = [int.from_bytes(p[co + 8 + wid * i:co + 8 + wid * (i + 1)],
                           "big") for i in range(n_chunks)]
    so = stsc[0]
    n_sc = int.from_bytes(p[so + 4:so + 8], "big")
    sc = [(int.from_bytes(p[so + 8 + 12 * i:so + 12 + 12 * i], "big"),
           int.from_bytes(p[so + 12 + 12 * i:so + 16 + 12 * i], "big"))
          for i in range(n_sc)]
    if not sc or not offs:
        return []
    frames = []
    si = 0
    for ci in range(1, n_chunks + 1):
        spc = next((s for fc, s in reversed(sc) if fc <= ci), sc[0][1])
        pos = offs[ci - 1]
        for _ in range(spc):
            if si >= n:
                break
            frames.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    return frames if len(frames) == n else []


def mp4_frame_timestamps(p: bytes):
    """Frame-start timestamps (seconds) of an MP4's first video track,
    or None if not ISO-BMFF — the container analogue of
    :func:`avi_frame_timestamps` (handles non-uniform stts deltas)."""
    info = parse_mp4(p)
    return None if info is None else info["timestamps"]


def mp4_sample_frames(p: bytes, ts: list[float]):
    """Decode the MJPEG samples of an MP4 nearest each timestamp in
    ``ts``.  Returns a list of uint8 pixel arrays, or None when the
    track is not MJPEG-coded ('jpeg'/'mjpa' sample entries) or sample
    tables are absent (avc1/hev1/mp4v need an external codec)."""
    info = parse_mp4(p)
    if info is None or not info["frames"] or \
            info["codec"] not in (b"jpeg", b"mjpa", b"mjpb"):
        return None
    from .jpeg import decode_jpeg_pixels
    tl = np.asarray(info["timestamps"])
    out = []
    for t in ts:
        off, ln = info["frames"][int(np.abs(tl - t).argmin())]
        frame = p[off:off + ln]
        if not frame.startswith(b"\xff\xd8"):
            return None
        px = decode_jpeg_pixels(frame)
        if px is None:
            return None
        out.append(px)
    return out


def _ebml_vint(p: bytes, i: int, keep_marker: bool):
    """EBML variable-length integer at ``p[i]`` → (value, next_i); IDs
    keep the length-marker bit, sizes strip it (all-ones payload =
    unknown size → None)."""
    if i >= len(p):
        return None, i
    b0 = p[i]
    if b0 == 0:
        return None, i + 1
    ln = 8 - b0.bit_length() + 1
    if i + ln > len(p):
        return None, len(p)
    v = int.from_bytes(p[i:i + ln], "big")
    if not keep_marker:
        v -= 1 << (7 * ln)
        if v == (1 << (7 * ln)) - 1:   # all value bits set: unknown
            return None, i + ln
    return v, i + ln


def _ebml_children(p: bytes, start: int, end: int):
    """Yield (element_id, body_off, body_len) for EBML elements in
    ``p[start:end]``; unknown-size elements extend to ``end``."""
    i = start
    while i < end:
        eid, i = _ebml_vint(p, i, keep_marker=True)
        if eid is None:
            return
        size, i = _ebml_vint(p, i, keep_marker=False)
        if size is None:
            size = end - i
        if i + size > end:
            return
        yield eid, i, size
        i += size


def _ebml_uint(p: bytes, off: int, ln: int) -> int:
    return int.from_bytes(p[off:off + ln], "big")


def parse_mkv(p: bytes):
    """REAL Matroska / WebM container parse — EBML walk, no codec
    library.  Finds the first video TrackEntry (TrackType 1), reads
    TimestampScale, then collects every SimpleBlock / Block of that
    track across Clusters: block timestamp = (cluster timestamp +
    int16 relative) × scale.  Returns ``{"codec", "timestamps",
    "frames": [(off, len), ...]}`` (frames only for unlaced blocks) or
    None if not EBML / no video track.  Element IDs per the public
    Matroska/EBML specs (RFC 8794)."""
    if p[:4] != b"\x1aE\xdf\xa3":
        return None
    segment = None
    for eid, off, ln in _ebml_children(p, 0, len(p)):
        if eid == 0x18538067:          # Segment
            segment = (off, ln)
            break
    if segment is None:
        return None
    scale = 1_000_000                  # default TimestampScale (ns)
    track_no = codec = None
    blocks = []                        # (ts_ticks, off, len | -1)
    for eid, off, ln in _ebml_children(p, segment[0],
                                       segment[0] + segment[1]):
        if eid == 0x1549A966:          # Info
            for e2, o2, l2 in _ebml_children(p, off, off + ln):
                if e2 == 0x2AD7B1:     # TimestampScale
                    scale = _ebml_uint(p, o2, l2)
        elif eid == 0x1654AE6B and track_no is None:   # Tracks
            for e2, o2, l2 in _ebml_children(p, off, off + ln):
                if e2 != 0xAE:         # TrackEntry
                    continue
                no = ttype = None
                cid = b""
                for e3, o3, l3 in _ebml_children(p, o2, o2 + l2):
                    if e3 == 0xD7:     # TrackNumber
                        no = _ebml_uint(p, o3, l3)
                    elif e3 == 0x83:   # TrackType
                        ttype = _ebml_uint(p, o3, l3)
                    elif e3 == 0x86:   # CodecID
                        cid = p[o3:o3 + l3].rstrip(b"\0")
                if ttype == 1 and no is not None:
                    track_no, codec = no, cid.decode("ascii", "replace")
                    break
        elif eid == 0x1F43B675:        # Cluster
            cts = 0
            for e2, o2, l2 in _ebml_children(p, off, off + ln):
                if e2 == 0xE7:         # cluster Timestamp
                    cts = _ebml_uint(p, o2, l2)
                elif e2 in (0xA3, 0xA0):   # SimpleBlock | BlockGroup
                    bo, bl = o2, l2
                    if e2 == 0xA0:     # BlockGroup → Block
                        blk = next(((o3, l3) for e3, o3, l3 in
                                    _ebml_children(p, o2, o2 + l2)
                                    if e3 == 0xA1), None)
                        if blk is None:
                            continue
                        bo, bl = blk
                    tno, j = _ebml_vint(p, bo, keep_marker=False)
                    if tno is None or j + 3 > bo + bl:
                        continue
                    rel = int.from_bytes(p[j:j + 2], "big", signed=True)
                    laced = p[j + 2] & 0x06
                    blocks.append((cts + rel, bo, bl, j + 3, laced))
    if track_no is None or not blocks:
        return None
    blocks.sort(key=lambda b: b[0])
    ts = [b[0] * scale / 1e9 for b in blocks]
    frames = [(-1, 0) if b[4] else (b[3], b[1] + b[2] - b[3])
              for b in blocks]
    return {"codec": codec, "timestamps": ts, "frames": frames}


def mkv_frame_timestamps(p: bytes):
    """Frame-start timestamps (seconds) of a Matroska/WebM video track,
    or None if not EBML — completes the container-timeline family
    (GIF / AVI / MP4 / MKV)."""
    info = parse_mkv(p)
    return None if info is None else info["timestamps"]


def mkv_sample_frames(p: bytes, ts: list[float]):
    """Decode the MJPEG blocks of a Matroska file nearest each
    timestamp in ``ts``.  Returns uint8 pixel arrays, or None when the
    track is not V_MJPEG or the chosen blocks are laced
    (VP8/VP9/H.264 tracks need an external codec)."""
    info = parse_mkv(p)
    if info is None or info["codec"] != "V_MJPEG":
        return None
    from .jpeg import decode_jpeg_pixels
    tl = np.asarray(info["timestamps"])
    out = []
    for t in ts:
        off, ln = info["frames"][int(np.abs(tl - t).argmin())]
        if off < 0:                    # laced block: no frame spans
            return None
        frame = p[off:off + ln]
        if not frame.startswith(b"\xff\xd8"):
            return None
        px = decode_jpeg_pixels(frame)
        if px is None:
            return None
        out.append(px)
    return out


def parse_y4m(p: bytes):
    """REAL YUV4MPEG2 (.y4m) parse — the codec-free raw-video format
    (mjpegtools yuv4mpeg(5) public spec): ASCII stream header
    ``YUV4MPEG2 W.. H.. F<num>:<den> C<cs> ...\\n`` then per-frame
    ``FRAME[ params]\\n`` + fixed-size planar YCbCr data, Y plane first.
    Returns ``{"width", "height", "num", "den", "colourspace",
    "frames": [(off, len), ...]}`` or None if not Y4M; a truncated
    final frame is dropped, not decoded from padding."""
    if not p.startswith(b"YUV4MPEG2"):
        return None
    nl = p.find(b"\n")
    if nl < 0:
        return None
    w = h = 0
    num, den = 25, 1
    cs = b"420"
    for tok in p[9:nl].split(b" "):
        if len(tok) < 2:
            continue
        c, v = tok[:1], tok[1:]
        try:
            if c == b"W":
                w = int(v)
            elif c == b"H":
                h = int(v)
            elif c == b"F":
                a, b = v.split(b":")
                num, den = int(a), int(b)
            elif c == b"C":
                cs = v
        except ValueError:
            return None
    if w <= 0 or h <= 0 or num <= 0 or den <= 0:
        return None
    if cs == b"444alpha":
        fsz = w * h * 4
    elif cs.startswith(b"420"):
        fsz = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    elif cs.startswith(b"411"):
        fsz = w * h + 2 * ((w + 3) // 4) * h
    elif cs.startswith(b"422"):
        fsz = w * h * 2
    elif cs.startswith(b"444"):
        fsz = w * h * 3
    elif cs.startswith(b"mono"):
        fsz = w * h
    else:
        return None
    frames = []
    i = nl + 1
    while i < len(p):
        if p[i:i + 5] != b"FRAME":
            break
        nl2 = p.find(b"\n", i)
        if nl2 < 0 or nl2 + 1 + fsz > len(p):
            break
        frames.append((nl2 + 1, fsz))
        i = nl2 + 1 + fsz
    if not frames:
        return None
    return {"width": w, "height": h, "num": num, "den": den,
            "colourspace": bytes(cs), "frames": frames}


def y4m_frame_timestamps(p: bytes):
    """Frame-start timestamps (seconds) of a YUV4MPEG2 stream, or None
    if not Y4M — frame i starts at i·den/num."""
    info = parse_y4m(p)
    if info is None:
        return None
    dt = info["den"] / info["num"]
    return [i * dt for i in range(len(info["frames"]))]


def y4m_sample_frames(p: bytes, ts: list[float]):
    """REAL pixel decode of the Y4M frames nearest each timestamp —
    no entropy coding at all: the Y plane IS the luma, returned as an
    (h, w) uint8 array per sampled frame."""
    info = parse_y4m(p)
    if info is None:
        return None
    w, h = info["width"], info["height"]
    dt = info["den"] / info["num"]
    out = []
    for t in ts:
        off, _ = info["frames"][min(len(info["frames"]) - 1,
                                    max(0, round(t / dt)))]
        out.append(np.frombuffer(p, dtype=np.uint8, count=w * h,
                                 offset=off).reshape(h, w))
    return out


class VideoFrameSampler:
    """Actor-pool frame-sampling stage (brief: decode / feature-extract /
    resize / frame-sample).

    real=True REALLY frame-samples animated GIFs, AVI, MP4,
    MKV/WebM and YUV4MPEG2 streams: the frame timeline comes from
    :func:`gif_frame_timestamps` (pure block walk), :func:`parse_avi`
    (RIFF walk), :func:`parse_mp4` (ISO-BMFF box walk, non-uniform
    stts deltas honoured), :func:`parse_mkv` (EBML walk) or
    :func:`parse_y4m` (ASCII header + fixed-size raw frames), and the
    sampler picks the frame nearest each fps-grid tick, capped at
    max_frames.  With ``decode_stats=True``, MJPEG payloads (in AVI,
    MP4 or MKV) and raw Y4M frames additionally get their SAMPLED
    frames pixel-decoded (:func:`avi_sample_frames` /
    :func:`mp4_sample_frames` / :func:`mkv_sample_frames` → :mod:`.jpeg`;
    :func:`y4m_sample_frames` reads the Y plane directly) and a
    ``frame_mean_luma`` list column — real video frame decode, no
    codec library.  Inter-frame-coded tracks (avc1/vp8/vp9) raise
    NotImplementedError per payload (ffmpeg/decord are not in this
    environment; that boundary is the only stubbed part).
    real=False emits a deterministic sha256-derived fake timeline.
    Output schema either way: ``frame_ts``: list<float64> seconds,
    ``n_frames``: int32 (+ ``frame_mean_luma``: list<float64> when
    decode_stats).
    """

    def __init__(self, fps: float = 1.0, max_frames: int = 16,
                 real: bool = False, decode_stats: bool = False):
        self.real = real
        self.fps = fps
        self.max_frames = max_frames
        self.decode_stats = decode_stats

    def _sample(self, timeline: list[float]) -> list[float]:
        """Nearest frame-start per 1/fps tick over the clip, deduped in
        order, capped at max_frames."""
        tl = np.asarray(timeline)
        end = tl[-1] + 0.1
        ticks = np.arange(0.0, end, 1.0 / self.fps)[: self.max_frames]
        idx = np.unique(np.abs(tl[None, :] - ticks[:, None]).argmin(1))
        return tl[idx].tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        all_ts, offsets = [], [0]
        all_luma, luma_offs = [], [0]
        for p in payloads:
            if self.real:
                timeline = gif_frame_timestamps(p or b"")
                if timeline is None:
                    timeline = avi_frame_timestamps(p or b"")
                if timeline is None:
                    timeline = mp4_frame_timestamps(p or b"")
                if timeline is None:
                    timeline = mkv_frame_timestamps(p or b"")
                if timeline is None:
                    timeline = y4m_frame_timestamps(p or b"")
                if timeline is None:
                    raise NotImplementedError(
                        "no parseable container timeline (GIF, AVI, "
                        "MP4, MKV/WebM and YUV4MPEG2 parse without "
                        "codec libraries; other raw elementary "
                        "streams need ffmpeg/decord, unavailable here)")
                picked = self._sample(timeline)
                all_ts.extend(picked)
                offsets.append(len(all_ts))
                if self.decode_stats:
                    frames = avi_sample_frames(p or b"", picked)
                    if frames is None:
                        frames = mp4_sample_frames(p or b"", picked)
                    if frames is None:
                        frames = mkv_sample_frames(p or b"", picked)
                    if frames is None:
                        frames = y4m_sample_frames(p or b"", picked)
                    if frames is None:
                        raise NotImplementedError(
                            "sampled-frame pixel decode needs an "
                            "MJPEG-in-AVI/MP4/MKV or YUV4MPEG2 payload "
                            "(inter-frame codecs need ffmpeg, "
                            "unavailable here)")
                    all_luma.extend(
                        float(f.mean()) / 255.0 if f.ndim == 2 else
                        float((f.reshape(-1, 3).astype(np.float64)
                               @ _LUMA_W).mean()) / 255.0
                        for f in frames)
                    luma_offs.append(len(all_luma))
                continue
            d = hashlib.sha256(b"v" + (p or b"")).digest()
            duration = 1.0 + d[0] / 8.0              # fake 1-33 s clip
            n = min(self.max_frames, max(1, int(duration * self.fps)))
            all_ts.extend((i + 0.5) / self.fps for i in range(n))
            offsets.append(len(all_ts))
            if self.decode_stats:
                all_luma.extend(d[8 + i] / 255.0 for i in range(n))
                luma_offs.append(len(all_luma))
        ts_arr = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(all_ts, type=pa.float64()))
        n_frames = np.diff(np.asarray(offsets)).astype(np.int32)
        batch = set_column(batch, "frame_ts", ts_arr)
        batch = set_column(batch, "n_frames", pa.array(n_frames))
        if self.decode_stats:
            batch = set_column(batch, "frame_mean_luma",
                               pa.ListArray.from_arrays(
                                   pa.array(luma_offs, type=pa.int32()),
                                   pa.array(all_luma, type=pa.float64())))
        return batch
