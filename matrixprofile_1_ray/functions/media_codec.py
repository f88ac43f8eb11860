"""Pure-NumPy codecs for self-contained media formats.

PPM/PGM (netpbm binary), uncompressed BMP, and PCM WAV need no external
library — just header parsing and ``np.frombuffer`` — so the multimodal
stages can REALLY decode, feature-extract and resample these formats
inside this container.  Formats whose codecs genuinely require absent
libraries (PNG/JPEG/MP4) stay behind the honest strict-mode stub in
stages/multimodal.py.

Everything here is deterministic (no rng, no floats in the parse path),
so decode -> features is bit-reproducible across engines and runs.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- netpbm

def _pnm_tokens(payload: bytes, n: int, start: int = 0):
    """First ``n`` whitespace-separated header tokens after ``start``,
    skipping '#' comments; returns (tokens, offset_past_last_whitespace)."""
    toks = []
    i = start
    length = len(payload)
    while len(toks) < n:
        while i < length and payload[i : i + 1].isspace():
            i += 1
        if i < length and payload[i : i + 1] == b"#":
            while i < length and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
            continue
        j = i
        while j < length and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(payload[i:j])
        i = j
    # exactly ONE whitespace byte separates the header from raster data
    return toks, i + 1


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 (RGB) -> (h, w, 3) uint8; P5 (gray) -> (h, w) uint8."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary netpbm payload")
    channels = 3 if payload[:2] == b"P6" else 1
    toks, off = _pnm_tokens(payload, 3, start=2)
    w, h, maxval = (int(t) for t in toks)
    if maxval != 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    need = w * h * channels
    raster = np.frombuffer(payload, np.uint8, count=need, offset=off)
    return raster.reshape((h, w, 3) if channels == 3 else (h, w))


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) -> P6 bytes; (h, w) -> P5 bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
        h, w = img.shape[:2]
    elif img.ndim == 2:
        magic = b"P5"
        h, w = img.shape
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    return b"%s\n%d %d\n255\n" % (magic, w, h) + img.tobytes()


# ------------------------------------------------------------------ BMP

def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP -> (h, w, 3) uint8 (RGB order)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or compression != 0 or bpp not in (24, 32):
        raise ValueError("only uncompressed 24/32-bit BI_RGB supported")
    bottom_up = h > 0
    h = abs(h)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    rgb = px[:, :, 2::-1]  # stored BGR(A) -> RGB
    return (rgb[::-1] if bottom_up else rgb).copy()


# ------------------------------------------------------------------ WAV

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV (8/16-bit) -> (samples [n, channels] float64 in [-1, 1],
    sample_rate).  Walks RIFF chunks; ignores non-fmt/data chunks."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError("only 8/16-bit PCM supported")
    if channels <= 0:
        raise ValueError("fmt chunk declares zero channels")
    if bits == 16:
        raw = np.frombuffer(data, "<i2", count=len(data) // 2)
        samples = raw.astype(np.float64) / 32768.0
    else:
        raw = np.frombuffer(data, np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    n = samples.shape[0] // channels
    return samples[: n * channels].reshape(n, channels), int(rate)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float samples in [-1, 1] (n,) or (n, channels) -> 16-bit PCM WAV."""
    samples = np.atleast_2d(np.asarray(samples, np.float64).T).T
    n, channels = samples.shape
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block = channels * 2
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                   rate * block, block, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


# -------------------------------------------------- dispatch + transforms

_IMAGE_MIMES = {"image/x-portable-pixmap": decode_ppm,
                "image/x-portable-graymap": decode_ppm,
                "image/bmp": decode_bmp}
_AUDIO_MIMES = {"audio/wav": decode_wav, "audio/x-wav": decode_wav}


def decode_any(mime: str, payload: bytes):
    """Real decode when the format is self-contained: returns
    ``("image", ndarray)`` or ``("audio", (samples, rate))``; ``None`` for
    formats that need an external codec (PNG/JPEG/video/text)."""
    if mime in _IMAGE_MIMES:
        return "image", _IMAGE_MIMES[mime](payload)
    if mime in _AUDIO_MIMES:
        return "audio", _AUDIO_MIMES[mime](payload)
    return None


def resize_nearest(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample with PIL's center-based source mapping
    (dst pixel i reads src ``floor((i + 0.5) * scale)``), so a cluster that
    swaps in a real ``PIL.Image.resize(..., NEAREST)`` for the other
    formats produces the same pixels for these."""
    h, w = img.shape[:2]
    if h <= 0 or w <= 0 or new_h <= 0 or new_w <= 0:
        raise ValueError(f"cannot resample {w}x{h} to {new_w}x{new_h}")
    rows = np.minimum(((np.arange(new_h) + 0.5) * (h / new_h)).astype(np.int64),
                      h - 1)
    cols = np.minimum(((np.arange(new_w) + 0.5) * (w / new_w)).astype(np.int64),
                      w - 1)
    return img[rows][:, cols]


def _luminance(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img.astype(np.float64)
    # ITU-R BT.601 integer-weight luma — exact in float64
    return (299.0 * img[:, :, 0] + 587.0 * img[:, :, 1]
            + 114.0 * img[:, :, 2]) / 1000.0


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic ``dim``-length feature vector: mean luminance over a
    ~sqrt(dim)-square grid of cells (box means via reduceat — exact),
    scaled to [0, 1].  The grid never exceeds the image (an image smaller
    than the grid gets one cell per pixel row/column; unused feature slots
    stay 0), so every cell has >= 1 pixel and the means are always finite."""
    lum = _luminance(img)
    h, w = lum.shape
    out = np.zeros(dim, np.float64)
    if h == 0 or w == 0:
        return out
    g_want = max(1, int(np.sqrt(dim)))
    gr, gc = min(g_want, h), min(g_want, w)
    r_edges = (np.arange(gr) * h) // gr
    c_edges = (np.arange(gc) * w) // gc
    cells = np.add.reduceat(np.add.reduceat(lum, r_edges, axis=0),
                            c_edges, axis=1)
    r_cnt = np.diff(np.append(r_edges, h))
    c_cnt = np.diff(np.append(c_edges, w))
    grid = cells / np.outer(r_cnt, c_cnt)
    out[: gr * gc] = (grid / 255.0).reshape(-1)
    return out


def audio_features(samples: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic ``dim``-length feature vector: RMS energy over up to
    ``dim`` equal time segments of the mixed-down signal.  A clip shorter
    than ``dim`` samples gets one segment per sample (remaining feature
    slots stay 0), so every segment is non-empty and the RMS is finite."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = mono.shape[0]
    out = np.zeros(dim, np.float64)
    if n == 0:
        return out
    g = min(dim, n)
    edges = (np.arange(g) * n) // g
    sums = np.add.reduceat(mono * mono, edges)
    counts = np.diff(np.append(edges, n))
    out[:g] = np.sqrt(sums / counts)
    return out


# ------------------------------------------------------------------ PNG
#
# Self-contained 8-bit PNG codec: stdlib zlib inflate/deflate + NumPy
# unfiltering.  Gray / gray+alpha / RGB / RGBA / palette, non-interlaced
# (PNG spec ISO/IEC 15948).  Lossless, so decode(encode(img)) == img
# bit-exactly and the featurization oracle replays end-to-end.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk, validating length and CRC."""
    import zlib

    i = 8
    n = len(payload)
    while i + 8 <= n:
        (size,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + size]
        if len(data) != size or i + 12 + size > n:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, i + 8 + size)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        i += 12 + size
        if ctype == b"IEND":
            return
    raise ValueError("PNG stream missing IEND")


def _paeth_predict(left, up, upleft):
    """Vectorized Paeth predictor (PNG spec 9.4): nearest of left/up/
    upleft to left+up-upleft, ties broken left, up, upleft."""
    p = left + up - upleft
    pa_ = np.abs(p - left)
    pb = np.abs(p - up)
    pc = np.abs(p - upleft)
    return np.where((pa_ <= pb) & (pa_ <= pc), left,
                    np.where(pb <= pc, up, upleft))


def _unfilter_scanlines(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Inverse PNG filtering -> (h, w*bpp) uint8.  None/Up are whole-row
    vectorized; Sub is a per-lane cumsum (recon[i] = sum of filtered bytes
    mod 256); Average/Paeth carry a left-pixel dependence, so they walk
    pixels with every per-step op vectorized across the bpp channels."""
    stride = w * bpp
    need = h * (stride + 1)
    if len(raw) < need:
        raise ValueError("PNG: inflated stream shorter than h scanlines")
    rows = np.frombuffer(raw, np.uint8, count=need).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    if ftypes.size and ftypes.max(initial=0) > 4:
        raise ValueError(f"PNG: invalid filter type {int(ftypes.max())}")
    data = rows[:, 1:].astype(np.int64)
    recon = np.zeros((h, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    for r in range(h):
        f = int(ftypes[r])
        cur = data[r]
        if f == 0:
            line = cur
        elif f == 2:                                   # Up
            line = (cur + prev) & 0xFF
        elif f == 1:                                   # Sub
            lanes = cur.reshape(-1, bpp)
            line = (np.cumsum(lanes, axis=0) & 0xFF).reshape(-1)
        else:                                          # Average / Paeth
            lanes = cur.reshape(-1, bpp)
            ups = prev.reshape(-1, bpp)
            out = np.empty_like(lanes)
            left = np.zeros(bpp, np.int64)
            upleft = np.zeros(bpp, np.int64)
            for i in range(lanes.shape[0]):
                if f == 3:
                    pred = (left + ups[i]) >> 1
                else:
                    pred = _paeth_predict(left, ups[i], upleft)
                left = (lanes[i] + pred) & 0xFF
                out[i] = left
                upleft = ups[i]
            line = out.reshape(-1)
        recon[r] = line
        prev = line
    return recon.astype(np.uint8)


# Adam7 interlace pass layout (PNG spec 8.2): (x_start, y_start, dx, dy)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _deinterlace_adam7(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Adam7 -> (h, w*bpp) uint8: each pass is an independently-filtered
    sub-image (its own scanlines, its own prev-row chain), unfiltered with
    the same vectorized paths and scattered to its strided grid."""
    out = np.zeros((h, w, bpp), np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        hp = (h - y0 + dy - 1) // dy
        wp = (w - x0 + dx - 1) // dx
        if hp <= 0 or wp <= 0:
            continue            # pass is empty at this image size
        need = hp * (wp * bpp + 1)
        if len(raw) - pos < need:
            raise ValueError("PNG: inflated stream shorter than the "
                             "Adam7 pass layout requires")
        sub = _unfilter_scanlines(raw[pos : pos + need], hp, wp, bpp)
        out[y0::dy, x0::dx] = sub.reshape(hp, wp, bpp)
        pos += need
    return out.reshape(h, w * bpp)


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit PNG -> uint8 array: gray (h, w), gray+alpha (h, w, 2), RGB
    (h, w, 3), RGBA (h, w, 4); palette images resolve through PLTE to
    (h, w, 3).  Both interlace methods (none / Adam7) are supported."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat = b""
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_n, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13])
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if ctype_n not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype_n}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if w == 0 or h == 0:
        raise ValueError("zero-size PNG")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    bpp = _PNG_CHANNELS[ctype_n]
    if interlace == 1:
        px = _deinterlace_adam7(raw, h, w, bpp)
    else:
        px = _unfilter_scanlines(raw, h, w, bpp)
    if ctype_n == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing/invalid PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = px.reshape(h, w)
        if idx.max(initial=0) >= pal.shape[0]:
            raise ValueError("PNG palette index out of range")
        return pal[idx]
    out = px.reshape(h, w, bpp)
    return out[:, :, 0] if bpp == 1 else out


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _filter_subimage(flat: np.ndarray, filters: str) -> np.ndarray:
    """Filter one (h, w, bpp) sub-image -> (h, w*bpp + 1) scanline rows.
    Fully vectorized: the reconstructed neighbors ARE the source pixels."""
    h, w = flat.shape[:2]
    cur = flat.astype(np.int64)
    left = np.zeros_like(cur)
    left[:, 1:] = cur[:, :-1]
    up = np.zeros_like(cur)
    up[1:] = cur[:-1]
    upleft = np.zeros_like(cur)
    upleft[1:, 1:] = cur[:-1, :-1]
    preds = {0: np.zeros_like(cur), 1: left, 2: up,
             3: (left + up) >> 1, 4: _paeth_predict(left, up, upleft)}
    out = np.empty((h, w * flat.shape[2] + 1), np.uint8)
    for r in range(h):
        f = r % 5 if filters == "cycle" else 0
        out[r, 0] = f
        out[r, 1:] = ((cur[r] - preds[f][r]) & 0xFF).reshape(-1)
    return out


def encode_png(img: np.ndarray, filters: str = "cycle",
               interlace: bool = False) -> bytes:
    """uint8 image -> 8-bit PNG.  ``filters="cycle"`` rotates None/Sub/
    Up/Average/Paeth by row (exercising every unfilter path on decode);
    ``"none"`` emits unfiltered rows.  ``interlace=True`` writes Adam7:
    each of the seven passes is filtered as an independent sub-image, per
    the spec."""
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ctype_n, bpp = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        bpp = img.shape[2]
        ctype_n = {2: 4, 3: 2, 4: 6}[bpp]
        flat = img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = flat.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode zero-size image")
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = flat[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_filter_subimage(sub, filters).tobytes())
        raw = b"".join(parts)
    else:
        raw = _filter_subimage(flat, filters).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_n, 0, 0,
                       1 if interlace else 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


# PNG is self-contained too (stdlib zlib): register for real decode
_IMAGE_MIMES["image/png"] = decode_png


def _decode_jpeg(payload: bytes) -> np.ndarray:
    """Lazy import so the (larger) JPEG module loads only when a JPEG
    payload actually appears in a batch."""
    from .jpeg_codec import decode_jpeg

    return decode_jpeg(payload)


# baseline JPEG is self-contained as well (pure-NumPy entropy decode +
# IDCT, functions/jpeg_codec.py): register for real decode
_IMAGE_MIMES["image/jpeg"] = _decode_jpeg
