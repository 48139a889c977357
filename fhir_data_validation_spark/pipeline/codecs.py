"""Pure-stdlib media codecs for the multimodal pipeline.

The container has no PIL/opencv/ffmpeg, but two real formats need no
external library at all:

* **PNG** — the container format is zlib (stdlib) + the five scanline
  filters from the PNG spec (https://www.w3.org/TR/png-3/). :func:`decode_png`
  reconstructs raw pixels for all five filter types and the standard 8-bit
  color types (gray, gray+alpha, RGB, RGBA, palette);
  :func:`encode_png` writes a spec-conformant image back (filter 0 rows,
  CRC-checked chunks). Conformance is tested against the JDK's
  ``javax.imageio.ImageIO`` through the Spark JVM bridge.
* **WAV** — the stdlib ``wave`` module parses the RIFF container;
  :func:`decode_wav` returns rate/channels/width/frames.

These are the *built-in adapters* for :func:`multimodal.decode` /
:func:`multimodal.resize` — other formats still require a caller-supplied
codec callable (and raise ``NotImplementedError`` otherwise). Everything
here runs inside Arrow-batched ``mapInPandas`` workers: per-payload Python
is the unavoidable cost of bit-level codec work, amortized over batches.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_MAGIC


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


# ---------------------------------------------------------------- PNG read --

def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse the per-scanline filters (types 0-4) into raw samples."""
    stride = width * bpp
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos:pos + stride])
        pos += stride
        off = y * stride
        prev_off = off - stride
        if ftype == 1:                                   # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:                                 # Up
            if y:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_off + i]) & 0xFF
        elif ftype == 3:                                 # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if y else 0
                line[i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:                                 # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if y else 0
                c = out[prev_off + i - bpp] if (y and i >= bpp) else 0
                line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[off:off + stride] = line
    return out


def decode_png(data: bytes) -> dict:
    """Decode an 8-bit non-interlaced PNG to raw pixels.

    Returns ``{width, height, channels, pixels}`` where ``pixels`` is
    ``height*width*channels`` bytes (palette images are expanded to RGB,
    so channels ∈ {1, 2, 3, 4}). Raises ``ValueError`` on malformed or
    unsupported (16-bit / interlaced) input — ALWAYS ValueError, so
    callers can route bad payloads to a violation lane with one except
    (truncated chunks and corrupt IDAT streams are normalized from
    struct/zlib errors).
    """
    try:
        return _decode_png(data)
    except ValueError:
        raise
    except (struct.error, zlib.error, EOFError, IndexError) as exc:
        raise ValueError(f"malformed PNG: {exc}") from exc


def _decode_png(data: bytes) -> dict:
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        expect_crc = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != expect_crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type, _comp, _filt,
             interlace) = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if width < 1 or height < 1:
        # a zero-dimension image decodes to an empty pixel buffer that
        # downstream indexing (aHash thumbnails) cannot handle — reject
        # as malformed like every other degenerate header
        raise ValueError(f"degenerate PNG dimensions {width}x{height}")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    bpp = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expected = height * (1 + width * bpp)
    if len(raw) != expected:
        raise ValueError(
            f"PNG IDAT length {len(raw)} != expected {expected}")
    pixels = _unfilter(raw, width, height, bpp)
    channels = bpp
    if color_type == 3:                                  # palette -> RGB
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        n_entries = len(palette) // 3
        if pixels and max(pixels) >= n_entries:
            # a short slice assignment would silently SHRINK the rgb
            # buffer and scramble every later pixel — malformed input
            # must raise, per the decoder contract
            raise ValueError(
                f"PNG palette index {max(pixels)} out of range "
                f"(PLTE has {n_entries} entries)")
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(pixels):
            rgb[3 * i:3 * i + 3] = palette[3 * idx:3 * idx + 3]
        pixels, channels = rgb, 3
    return {"width": width, "height": height, "channels": channels,
            "pixels": bytes(pixels)}


# --------------------------------------------------------------- PNG write --

_COLOR_TYPE_FOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(pixels: bytes, width: int, height: int,
               channels: int = 3) -> bytes:
    """Encode raw 8-bit pixels (``height*width*channels`` bytes, channels ∈
    {1,2,3,4}) as a spec-conformant PNG (filter 0 scanlines)."""
    if channels not in _COLOR_TYPE_FOR:
        raise ValueError(f"channels must be 1-4, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8,
                       _COLOR_TYPE_FOR[channels], 0, 0, 0)
    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)                                    # filter type None
        raw += pixels[y * stride:(y + 1) * stride]
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def resize_nearest(pixels: bytes, width: int, height: int, channels: int,
                   new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample of a raw pixel buffer."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = min(y * height // new_h, height - 1)
        row = sy * width * channels
        orow = y * new_w * channels
        for x in range(new_w):
            sx = min(x * width // new_w, width - 1)
            src = row + sx * channels
            dst = orow + x * channels
            out[dst:dst + channels] = pixels[src:src + channels]
    return bytes(out)


# --------------------------------------------------------------------- WAV --

def decode_wav(data: bytes) -> dict:
    """Parse a RIFF/WAVE payload with the stdlib ``wave`` module:
    ``{sample_rate, n_channels, sample_width, n_samples, duration_s}``.
    Malformed payloads ALWAYS raise ValueError, matching decode_png's
    contract — ``wave.Error`` is NOT a ValueError subclass, so a
    truncated or non-PCM payload used to escape the one ``except`` the
    family documents and kill the Spark task (round-5 review batch 13)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            rate, n = w.getframerate(), w.getnframes()
            return {"sample_rate": rate,
                    "n_channels": w.getnchannels(),
                    "sample_width": w.getsampwidth(),
                    "n_samples": n,
                    "duration_s": round(n / rate, 6) if rate else 0.0}
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"bad WAV payload: {exc}") from exc


def encode_wav(frames: bytes, sample_rate: int = 16000,
               n_channels: int = 1, sample_width: int = 2) -> bytes:
    """Write PCM frames into a RIFF/WAVE container (test-fixture helper)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sample_width)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


# --------------------------------------------------- multimodal adapters ----

def stdlib_decoder(modality: str, payload: bytes) -> dict:
    """Built-in ``multimodal.decode`` adapter: real decode for PNG images
    and WAV audio, ``NotImplementedError`` for everything else (sniffed by
    magic bytes, so a mislabeled modality still decodes)."""
    if is_png(payload):
        img = decode_png(payload)
        px = img["pixels"]
        mean = round(sum(px) / len(px), 2) if px else 0.0
        return {"format": "png", "width": img["width"],
                "height": img["height"], "channels": img["channels"],
                "mean_pixel": mean}
    if is_wav(payload):
        out = decode_wav(payload)
        out["format"] = "wav"
        return out
    raise NotImplementedError(
        f"no built-in codec for this {modality} payload "
        f"(header {payload[:4]!r}); PNG and WAV decode with the stdlib "
        "adapter - other formats need a caller-supplied decoder")


def stdlib_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Built-in ``multimodal.resize`` adapter: PNG in → nearest-neighbor
    resample → PNG out. Non-PNG payloads need a caller-supplied resizer."""
    if not is_png(payload):
        raise NotImplementedError(
            "stdlib resizer handles PNG only - pass resizer= for other "
            "formats")
    img = decode_png(payload)
    px = resize_nearest(img["pixels"], img["width"], img["height"],
                        img["channels"], width, height)
    return encode_png(px, width, height, img["channels"])
