"""Stdlib PNG/WAV codecs: roundtrip + cross-implementation conformance
against the JDK's javax.imageio (through the Spark JVM bridge) — a real
second implementation, not a self-roundtrip."""

import random

import pytest

from fhir_data_validation_spark.pipeline import codecs, multimodal


def _random_pixels(w, h, c, seed=1):
    rnd = random.Random(seed)
    return bytes(rnd.randrange(256) for _ in range(w * h * c))


# ------------------------------------------------------------- roundtrips --

@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    w, h = 9, 7  # odd sizes catch stride bugs
    px = _random_pixels(w, h, channels, seed=channels)
    img = codecs.decode_png(codecs.encode_png(px, w, h, channels))
    assert (img["width"], img["height"], img["channels"]) == (w, h, channels)
    assert img["pixels"] == px


def test_png_rejects_garbage():
    with pytest.raises(ValueError, match="bad signature"):
        codecs.decode_png(b"not a png at all")
    # corrupt a CRC byte
    good = bytearray(codecs.encode_png(_random_pixels(4, 4, 3), 4, 4, 3))
    good[20] ^= 0xFF
    with pytest.raises(ValueError):
        codecs.decode_png(bytes(good))


def test_png_truncated_and_corrupt_idat_raise_valueerror():
    """The documented contract is ValueError for ANY malformed input —
    truncation (struct.error) and corrupt IDAT (zlib.error) included."""
    full = codecs.encode_png(_random_pixels(6, 6, 3), 6, 6, 3)
    with pytest.raises(ValueError):
        codecs.decode_png(full[: len(full) // 2])          # mid-chunk cut
    blown = bytearray(full)
    # flip bytes inside the IDAT payload (after the 8-byte sig + IHDR);
    # recompute nothing — CRC check or inflate must fail as ValueError
    for i in range(45, 55):
        blown[i] ^= 0xA5
    with pytest.raises(ValueError):
        codecs.decode_png(bytes(blown))


def test_wav_roundtrip():
    frames = bytes(range(200)) * 2  # 200 16-bit mono samples
    wav = codecs.encode_wav(frames, sample_rate=8000, n_channels=1,
                            sample_width=2)
    meta = codecs.decode_wav(wav)
    assert meta == {"sample_rate": 8000, "n_channels": 1, "sample_width": 2,
                    "n_samples": 200, "duration_s": 0.025}


def test_resize_nearest_identity_and_downscale():
    w, h = 8, 6
    px = _random_pixels(w, h, 3)
    assert codecs.resize_nearest(px, w, h, 3, w, h) == px
    half = codecs.resize_nearest(px, w, h, 3, 4, 3)
    assert len(half) == 4 * 3 * 3
    assert half[0:3] == px[0:3]  # top-left pixel preserved


# ---------------------------------------- JDK ImageIO cross-conformance ----

def _java_encode_png(spark, px, w, h):
    """Encode RGB pixels with javax.imageio — its adaptive filter choice
    exercises the Sub/Up/Average/Paeth reconstruction paths."""
    jvm = spark._jvm
    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            rgb = (px[i] << 16) | (px[i + 1] << 8) | px[i + 2]
            bi.setRGB(x, y, rgb)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "png", baos)
    return bytes(baos.toByteArray())


def _java_decode_png(spark, data):
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
    img = jvm.javax.imageio.ImageIO.read(bais)
    w, h = img.getWidth(), img.getHeight()
    px = bytearray()
    for y in range(h):
        for x in range(w):
            rgb = img.getRGB(x, y)
            px += bytes(((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF))
    return w, h, bytes(px)


def test_python_decodes_java_png(spark):
    w, h = 12, 10
    px = _random_pixels(w, h, 3, seed=42)
    img = codecs.decode_png(_java_encode_png(spark, px, w, h))
    assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
    assert img["pixels"] == px


def test_java_decodes_python_png(spark):
    w, h = 11, 5
    px = _random_pixels(w, h, 3, seed=7)
    jw, jh, jpx = _java_decode_png(spark, codecs.encode_png(px, w, h, 3))
    assert (jw, jh) == (w, h)
    assert jpx == px


# ---------------------------------------------------- Spark dataflow path --

def test_decode_dataflow_with_stdlib_codecs(spark):
    png = codecs.encode_png(_random_pixels(6, 4, 3, seed=3), 6, 4, 3)
    wav = codecs.encode_wav(b"\x00\x01" * 100, sample_rate=16000)
    df = spark.createDataFrame(
        [("img1", "image", bytearray(png), {"k": "v"}),
         ("aud1", "audio", bytearray(wav), {})],
        multimodal.MULTIMODAL_SCHEMA)
    out = {r["doc_id"]: dict(r["feature"])
           for r in multimodal.decode(df).collect()}
    assert out["img1"]["format"] == "png"
    assert (out["img1"]["width"], out["img1"]["height"]) == ("6", "4")
    assert out["aud1"]["format"] == "wav"
    assert out["aud1"]["n_samples"] == "100"


def test_decode_dataflow_unsupported_format_takes_err_lane(spark):
    """round-5 review regressions (batch 13): one unsupported or corrupt
    payload routes to the error feature (lenient S2 contract, like
    image_ahash) instead of failing the whole stage; a truncated WAV's
    wave.Error normalizes to ValueError so the same lane catches it."""
    df = spark.createDataFrame(
        [("d1", "image", bytearray(b"GIF89a....."), {}),
         ("d2", "audio", bytearray(b"RIFF\x24\x00\x00\x00WAVE"), {}),
         ("d3", "image", bytearray(
             codecs.encode_png(_random_pixels(2, 2, 3, seed=1), 2, 2, 3)),
          {})],
        multimodal.MULTIMODAL_SCHEMA)
    out = {r["doc_id"]: dict(r["feature"])
           for r in multimodal.decode(df).collect()}
    assert "no built-in codec" in out["d1"]["error"]
    assert "bad WAV payload" in out["d2"]["error"]
    assert out["d3"]["width"] == "2"        # healthy rows still decode


def test_resize_dataflow_png(spark):
    png = codecs.encode_png(_random_pixels(8, 8, 3, seed=9), 8, 8, 3)
    df = spark.createDataFrame(
        [("img1", "image", bytearray(png), {}),
         ("aud1", "audio", bytearray(b"RIFFxxxxWAVE"), {})],
        multimodal.MULTIMODAL_SCHEMA)
    rows = {r["doc_id"]: r for r in
            multimodal.resize(df, 4, 4).collect()}
    resized = codecs.decode_png(bytes(rows["img1"]["payload"]))
    assert (resized["width"], resized["height"]) == (4, 4)
    assert dict(rows["img1"]["meta"])["resized_w"] == "4"
    # non-image rows pass through untouched
    assert bytes(rows["aud1"]["payload"]) == b"RIFFxxxxWAVE"


def test_image_ahash_and_near_dup(spark):
    """aHash over REAL stdlib-encoded PNGs: identical images hash equal,
    a lightly-noised copy lands within a few bits, a structurally
    different image lands far; undecodable payloads take the err lane;
    image_near_dup pairs exact + near copies through the pigeonhole core."""
    import numpy as np
    from fhir_data_validation_spark.pipeline.codecs import encode_png
    from fhir_data_validation_spark.pipeline.multimodal import (image_ahash,
                                                                image_near_dup)
    rng = np.random.RandomState(7)
    w = h = 32
    base = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    # smooth gradient so near-dup noise can't flip thumbnail cells
    grad = np.tile(np.linspace(20, 235, w).astype(np.uint8), (h, 1))
    grad = np.stack([grad, grad, grad], axis=2)
    noisy = grad.astype(np.int16).copy()
    noisy[::9, ::9] += 6                       # tiny local perturbation
    inverted = (255 - grad).astype(np.uint8)   # structurally different
    rows = [
        ("g1", "image", bytearray(encode_png(grad.tobytes(), w, h, 3))),
        ("g2", "image", bytearray(encode_png(grad.tobytes(), w, h, 3))),
        ("g3", "image", bytearray(encode_png(
            np.clip(noisy, 0, 255).astype(np.uint8).tobytes(), w, h, 3))),
        ("inv", "image", bytearray(encode_png(inverted.tobytes(), w, h, 3))),
        ("rnd", "image", bytearray(encode_png(base.tobytes(), w, h, 3))),
        ("bad", "image", bytearray(b"not a png at all")),
    ]
    df = spark.createDataFrame(rows,
                               "doc_id string, modality string, payload binary")
    got = {r["doc_id"]: r for r in image_ahash(df).collect()}
    assert got["g1"]["ahash"] == got["g2"]["ahash"] is not None
    assert got["bad"]["ahash"] is None and "NotImplementedError" \
        in got["bad"]["err"]
    mask = (1 << 64) - 1
    ham = bin((got["g1"]["ahash"] ^ got["g3"]["ahash"]) & mask).count("1")
    assert ham <= 3
    far = bin((got["g1"]["ahash"] ^ got["inv"]["ahash"]) & mask).count("1")
    assert far > 3
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dup(df, max_distance=3).collect()}
    assert pairs[("g1", "g2")] == 0
    assert ("g1", "g3") in pairs and ("g2", "g3") in pairs
    assert all("inv" not in k and "bad" not in k for k in pairs)


# --------------------------------------------- round-3 review regressions ---

def test_png_palette_index_out_of_range_raises():
    """A palette index past the PLTE table must raise, not silently
    shrink the pixel buffer and scramble everything after it."""
    import struct
    import zlib

    import pytest

    from fhir_data_validation_spark.pipeline.codecs import decode_png

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)   # 2x1 palette
    plte = bytes([255, 0, 0])                             # ONE entry
    raw = bytes([0, 0, 1])                                # idx 1 >= 1
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", plte)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(png)


def test_png_zero_dimensions_raise():
    import struct
    import zlib

    import pytest

    from fhir_data_validation_spark.pipeline.codecs import decode_png

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 0, 8, 0, 0, 0, 0)   # height 0
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"")) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="degenerate"):
        decode_png(png)
