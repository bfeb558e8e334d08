"""Multimodal plumbing tests (decode is stubbed; schemas/batching real)."""

from mover_spark.operators.multimodal import (
    frame_sample,
    image_features,
    media_fixture_from_documents,
    resize_images,
)


def _media(spark, catalog):
    return media_fixture_from_documents(catalog.df("documents")).persist()


def test_image_features_deterministic(spark, catalog):
    media = _media(spark, catalog)
    rows = image_features(media).collect()
    assert rows, "round-robin fixture must contain images"
    assert all(r.decoder in ("pil", "fake") for r in rows)
    assert all(64 <= r.width < 256 and 64 <= r.height < 256 for r in rows)
    assert all(r.aspect_ratio == r.width / r.height for r in rows)  # exact IEEE division
    again = image_features(media).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_resize_scales_metadata(spark, catalog):
    media = _media(spark, catalog)
    feats = image_features(media).select("media_id", "width", "height")
    enriched = media.drop("width", "height").join(feats, "media_id")
    out = resize_images(enriched, max_side=100).collect()
    assert all(max(r.width, r.height) <= 100 for r in out)
    assert all(r.content is not None for r in out)  # stub passes bytes through


def test_frame_sample_plan(spark, catalog):
    media = _media(spark, catalog)
    frames = frame_sample(media, every_ms=500)
    row = frames.groupBy("media_id").count().collect()
    assert row, "fixture contains videos"
    got = frames.where("media_id = 2").collect()
    if got:
        assert [r.frame_idx for r in got] == list(range(len(got)))
        assert all(r.offset_ms == i * 500 for i, r in enumerate(sorted(got, key=lambda x: x.frame_idx)))


def test_audio_features_deterministic_fake(spark, catalog):
    """Audio modality: schema-stable Arrow batches, digest-deterministic
    fake decode (librosa absent here), duration carried from metadata."""
    from mover_spark.operators.multimodal import (
        audio_features,
        media_fixture_from_documents,
    )

    media = media_fixture_from_documents(catalog.df("documents"), n=30)
    out = audio_features(media)
    rows = out.collect()
    assert rows and all(r.decoder == "fake" for r in rows)
    assert all(r.sample_rate in (8000, 16000, 22050, 44100) for r in rows)
    assert all(0.0 <= r.rms_level <= 1.0 for r in rows)
    # deterministic: a second run yields identical rows
    again = audio_features(media).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# real-bytes decode arms (stdlib PNG / WAV)
# ---------------------------------------------------------------------------

def _encode_png(pixels, n_ch, filters):
    """Minimal PNG encoder (test-side reference, independent of the
    decoder): `pixels` is a list of rows, each a list of byte values
    (len = width*n_ch); `filters` gives the filter type per row and the
    encoder applies the FORWARD filter transform, so decoding exercises
    the chosen reconstruction branches."""
    import struct
    import zlib

    h = len(pixels)
    w = len(pixels[0]) // n_ch
    color_type = {1: 0, 3: 2, 4: 6}[n_ch]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = [0] * (w * n_ch)
    for y, row in enumerate(pixels):
        f = filters[y]
        raw.append(f)
        for i, v in enumerate(row):
            left = row[i - n_ch] if i >= n_ch else 0
            up = prev[i]
            ul = prev[i - n_ch] if i >= n_ch else 0
            if f == 0:
                out = v
            elif f == 1:
                out = v - left
            elif f == 2:
                out = v - up
            elif f == 3:
                out = v - ((left + up) >> 1)
            else:  # paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                out = v - pred
            raw.append(out & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filters_gray_and_rgb():
    """The stdlib decoder must reconstruct every PNG filter type exactly:
    encode a pseudo-random image with one row per filter (None, Sub, Up,
    Average, Paeth) and compare dimensions + mean luma against direct
    computation on the raw pixels."""
    import random

    from mover_spark.operators.multimodal import _png_decode

    rng = random.Random(7)
    # grayscale 6x5, every filter type exercised (row 5 repeats paeth)
    gray = [[rng.randrange(256) for _ in range(6)] for _ in range(5)]
    png = _encode_png(gray, 1, [0, 1, 2, 3, 4])
    w, h, luma = _png_decode(png)
    want = sum(sum(r) for r in gray) / 30 / 255.0
    assert (w, h) == (6, 5)
    assert abs(luma - want) < 1e-12

    # RGB 4x5 with ITU-R 601 luma
    rgb = [[rng.randrange(256) for _ in range(4 * 3)] for _ in range(5)]
    png = _encode_png(rgb, 3, [4, 3, 2, 1, 0])
    w, h, luma = _png_decode(png)
    want = (
        sum(
            0.299 * r[i] + 0.587 * r[i + 1] + 0.114 * r[i + 2]
            for r in rgb
            for i in range(0, 12, 3)
        )
        / 20
        / 255.0
    )
    assert (w, h) == (4, 5)
    assert abs(luma - want) < 1e-12


def test_wav_decode_known_samples():
    """The stdlib WAV arm must report exact rate/duration and the numpy
    RMS of the normalized 16-bit samples."""
    import io
    import struct
    import wave

    import numpy as np

    from mover_spark.operators.multimodal import _wav_decode

    samples = [0, 16384, -16384, 32767, -32768, 0, 8192, -8192]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(struct.pack("<8h", *samples))
    dur, rate, rms = _wav_decode(buf.getvalue())
    assert rate == 8000
    assert dur == int(8 / 8000 * 1000)
    x = np.array(samples, dtype=np.float64) / 32768.0
    assert abs(rms - float(np.sqrt((x**2).mean()))) < 1e-12


def test_mixed_corpus_decodes_real_bytes_per_row(spark):
    """End-to-end through the Spark kernels: a media table holding a REAL
    PNG, a REAL WAV, and an opaque blob must come back with decoder
    'png-stdlib' / 'wav-stdlib' for the real bytes (exact features) and
    'fake' for the blob — the per-row chain, not a per-batch all-or-
    nothing switch."""
    import io
    import struct
    import wave

    from mover_spark.operators.multimodal import audio_features, image_features

    png = _encode_png([[10, 20, 30], [40, 50, 60]], 1, [0, 2])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(struct.pack("<4h", 1000, -1000, 2000, -2000))
    rows = [
        (1, "image", bytearray(png), "png", None, None, None),
        (2, "image", bytearray(b"not an image"), "raw", None, None, None),
        (3, "audio", bytearray(buf.getvalue()), "wav", None, None, 999),
        (4, "audio", bytearray(b"not audio"), "raw", None, None, 999),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, media_type string, content binary, format string, "
        "width int, height int, duration_ms long",
    )
    img = {r.media_id: r for r in image_features(media).collect()}
    assert img[1].decoder == "png-stdlib"
    assert (img[1].width, img[1].height) == (3, 2)
    assert abs(img[1].mean_luma - (10 + 20 + 30 + 40 + 50 + 60) / 6 / 255.0) < 1e-12
    assert img[2].decoder == "fake"

    aud = {r.media_id: r for r in audio_features(media).collect()}
    assert aud[3].decoder == "wav-stdlib"
    assert aud[3].sample_rate == 16000
    assert aud[3].duration_ms == 0  # 4 frames @16kHz -> 0.25 ms -> floor 0
    assert aud[4].decoder == "fake"
    assert aud[4].duration_ms == 999  # fake arm passes metadata through


def test_unsupported_real_codecs_degrade_to_fake_not_crash(spark):
    """A real-but-unsupported media payload (palette PNG, 24-bit WAV,
    truncated IDAT) must degrade to the fake arm — one bad row in a media
    corpus must never kill the whole job (the stdlib arms raise on these,
    and the raise used to propagate out of mapInPandas)."""
    import io
    import struct
    import wave
    import zlib

    from mover_spark.operators.multimodal import audio_features, image_features

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    # palette PNG (color_type 3): valid file, unsupported by the decoder
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    palette_png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", bytes([255, 0, 0]))
        + chunk(b"IDAT", zlib.compress(bytes([0, 0, 0, 0, 0, 0])))
        + chunk(b"IEND", b"")
    )
    # truncated IDAT: zlib stream cut mid-way
    trunc_png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(6))[:4]) + chunk(b"IEND", b"")
    )
    imgs = spark.createDataFrame(
        [(1, "image", palette_png, None), (2, "image", trunc_png, None)],
        "media_id long, media_type string, content binary, duration_ms long",
    )
    rows = {r.media_id: r for r in image_features(imgs).collect()}
    assert rows[1].decoder == "fake" and rows[2].decoder == "fake"

    # 24-bit PCM WAV: wave writes it fine, the 16-bit-only decoder raises
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        wf.writeframes(b"\x01\x02\x03" * 16)
    wav24 = buf.getvalue()
    auds = spark.createDataFrame(
        [(3, "audio", wav24, 7)],
        "media_id long, media_type string, content binary, duration_ms long",
    )
    arow = audio_features(auds).collect()[0]
    assert arow.decoder == "fake"
    assert arow.duration_ms == 7  # fake arm keeps the metadata duration


def _encode_gif(pixels, palette):
    """Minimal valid GIF89a encoder for fixtures: one frame, global color
    table, LZW stream that emits a CLEAR before every pixel code (legal
    per spec — the dictionary never grows, so the code width stays fixed
    at min_code_size+1, LSB-first packing)."""
    import math
    import struct

    h = len(pixels)
    w = len(pixels[0])
    n = max(2, len(palette))
    bits = max(1, math.ceil(math.log2(n)))
    table_n = 1 << bits  # GIF tables are power-of-two sized
    gct = b"".join(
        bytes(palette[i]) if i < len(palette) else b"\x00\x00\x00"
        for i in range(table_n)
    )
    min_code = max(2, bits)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    # bit-pack LSB-first: CLEAR p CLEAR p ... EOI
    acc = nbits = 0
    data = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for row in pixels:
        for px in row:
            emit(clear)
            emit(px)
    emit(eoi)
    if nbits:
        data.append(acc & 0xFF)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (0x70) | (bits - 1), 0, 0)
    out += gct
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([min_code])
    i = 0
    while i < len(data):  # sub-blocks of <= 255 bytes
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
        i += 255
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decode_real_bytes():
    """The second real stdlib image arm (VERDICT r8 #7): a hand-encoded
    GIF89a with a known palette decodes via the LZW path to exact
    dimensions and mean luma; truncated and interlaced variants raise."""
    import pytest as _pytest

    from mover_spark.operators.multimodal import _gif_decode

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    pixels = [[0, 1, 2], [3, 0, 1]]  # 3x2, all four colors
    gif = _encode_gif(pixels, palette)
    w, h, luma = _gif_decode(gif)
    assert (w, h) == (3, 2)
    lut = [0.299 * r + 0.587 * g + 0.114 * b for r, g, b in palette]
    want = sum(lut[p] for row in pixels for p in row) / 6 / 255.0
    assert abs(luma - want) < 1e-9
    with _pytest.raises(ValueError):
        _gif_decode(gif[:20])  # truncated before any frame data
    with _pytest.raises(ValueError):
        _gif_decode(b"NOTGIF" + gif[6:])


def test_gif_arm_in_image_features(spark):
    """image_features routes real GIF bytes through 'gif-stdlib' (exact
    features), keeps PNG on its own arm, and degrades corrupt GIFs to the
    deterministic fake instead of failing the job."""
    from mover_spark.operators.multimodal import MEDIA_SCHEMA, image_features

    gif = _encode_gif([[0, 1], [1, 0]], [(0, 0, 0), (255, 255, 255)])
    bad = gif[:-10]  # truncated LZW payload
    rows = [
        (1, "image", bytearray(gif), "gif", None, None, None),
        (2, "image", bytearray(bad), "gif", None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in image_features(df).collect()}
    assert got[1].decoder == "gif-stdlib"
    assert (got[1].width, got[1].height) == (2, 2)
    assert abs(got[1].mean_luma - 0.5) < 1e-9
    assert got[2].decoder == "fake"


def _encode_bmp(pixels_rgb, bpp=24, top_down=False):
    """Hand-encode an uncompressed BITMAPINFOHEADER BMP from a row-major
    RGB pixel grid (list of rows of (r, g, b)). Rows are stored
    bottom-up unless top_down (negative height), padded to 4 bytes —
    the two layouts real writers emit."""
    import struct

    h, w = len(pixels_rgb), len(pixels_rgb[0])
    n_b = bpp // 8
    stride = (w * n_b + 3) & ~3
    rows = pixels_rgb if top_down else list(reversed(pixels_rgb))
    body = b""
    for row in rows:
        line = b"".join(
            bytes((b, g, r)) + (b"\x00" if n_b == 4 else b"")
            for (r, g, b) in row
        )
        body += line + b"\x00" * (stride - len(line))
    pix_off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40, w, (-h if top_down else h), 1, bpp, 0, len(body), 2835, 2835, 0, 0,
    )
    return hdr + dib + body


def test_bmp_decode_real_bytes():
    """The third real stdlib image arm (round-10): hand-encoded 24-bit
    BMPs decode to exact dimensions and mean luma in BOTH row orders
    (bottom-up and top-down), 32-bit BGRX too; truncated pixel arrays
    and RLE/palette shapes raise."""
    import struct

    import pytest as _pytest

    from mover_spark.operators.multimodal import _bmp_decode

    pixels = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(255, 255, 255), (0, 0, 0), (128, 128, 128)],
    ]
    want = sum(
        0.299 * r + 0.587 * g + 0.114 * b for row in pixels for (r, g, b) in row
    ) / 6 / 255.0
    for top_down in (False, True):
        w, h, luma = _bmp_decode(_encode_bmp(pixels, top_down=top_down))
        assert (w, h) == (3, 2)
        assert abs(luma - want) < 1e-9
    w, h, luma = _bmp_decode(_encode_bmp(pixels, bpp=32))
    assert (w, h) == (3, 2) and abs(luma - want) < 1e-9
    bmp = _encode_bmp(pixels)
    with _pytest.raises(ValueError):
        _bmp_decode(bmp[:-8])  # truncated pixel array
    rle = bytearray(bmp)
    struct.pack_into("<I", rle, 30, 1)  # compression=BI_RLE8
    with _pytest.raises(ValueError):
        _bmp_decode(bytes(rle))
    with _pytest.raises(ValueError):
        _bmp_decode(b"XX" + bmp[2:])


def test_bmp_arm_in_image_features(spark):
    """image_features routes real BMP bytes through 'bmp-stdlib' (exact
    features) and degrades corrupt BMPs to the deterministic fake
    instead of failing the job."""
    from mover_spark.operators.multimodal import MEDIA_SCHEMA, image_features

    bmp = _encode_bmp([[(255, 255, 255), (0, 0, 0)], [(0, 0, 0), (255, 255, 255)]])
    bad = bmp[:-6]  # truncated pixel array
    rows = [
        (1, "image", bytearray(bmp), "bmp", None, None, None),
        (2, "image", bytearray(bad), "bmp", None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in image_features(df).collect()}
    assert got[1].decoder == "bmp-stdlib"
    assert (got[1].width, got[1].height) == (2, 2)
    assert abs(got[1].mean_luma - 0.5) < 1e-9
    assert got[2].decoder == "fake"


def test_jpeg_magic_blob_degrades_without_pil(spark):
    """A JPEG-magic blob in a no-PIL environment must flow through the
    decoder chain to the deterministic fake arm — one undecodable row
    never kills the job (the same contract as truncated PNG/GIF/BMP)."""
    import pyspark.sql.functions as F

    jpegish = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + b"\x00" * 40
    media = spark.createDataFrame(
        [(1, "image", jpegish), (2, "image", None)],
        "media_id long, media_type string, content binary",
    )
    rows = {r.media_id: r for r in image_features(media).collect()}
    assert len(rows) == 2
    try:
        import PIL  # noqa: F401

        assert rows[1].decoder in ("pil", "fake")
    except ImportError:
        assert rows[1].decoder == "fake"
    assert rows[2].decoder == "fake"  # NULL content
    assert all(r.width > 0 and r.height > 0 for r in rows.values())


def test_pil_jpeg_real_decode(spark):
    """Round-11 conditional real-codec arm (VERDICT item 6): when PIL is
    installed, a real JPEG generated at a known size/gray level must
    decode through the 'pil' arm with exact dimensions and ~mid luma —
    the same feature contract the stdlib PNG/GIF/BMP arms satisfy.
    Skip-marked in environments without PIL (this container)."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (6, 4), (128, 128, 128)).save(buf, "JPEG")
    media = spark.createDataFrame(
        [(1, "image", buf.getvalue())],
        "media_id long, media_type string, content binary",
    )
    r = image_features(media).collect()[0]
    assert r.decoder == "pil"
    assert (r.width, r.height) == (6, 4)
    assert abs(r.mean_luma - 128 / 255) < 0.02  # JPEG is lossy; gray survives
    assert r.aspect_ratio == 6 / 4


# ---------------------------------------------------------------------------
# round 12: stdlib baseline-JPEG arm — a minimal in-test ENCODER generates
# real T.81 baseline bytes (custom canonical Huffman tables are legal JPEG,
# so no standard-table transcription), and _jpeg_decode must recover exact
# dimensions and near-exact mean luma (quant tables of 1s => only DCT
# round-off separates encode and decode)
# ---------------------------------------------------------------------------


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def emit(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc, self.nbits = 0, 0

    def flush(self):
        while self.nbits:  # pad with 1-bits to the byte boundary
            self.emit(1, 1)
        out, self.out = self.out, bytearray()
        return bytes(out)


def _fdct_quant_zigzag(block8x8):
    """Forward orthonormal DCT + round (quant=1) in zigzag order."""
    from mover_spark.operators.multimodal import _JPEG_ZIGZAG, _jpeg_idct_a

    A = _jpeg_idct_a()
    sh = [[p - 128.0 for p in row] for row in block8x8]
    tmp = [
        [sum(A[v][x] * sh[y][x] for x in range(8)) for v in range(8)]
        for y in range(8)
    ]
    S = [
        sum(A[u][y] * tmp[y][v] for y in range(8))
        for u in range(8)
        for v in range(8)
    ]
    return [int(round(S[zz])) for zz in _JPEG_ZIGZAG]


def _block_at(plane, w, h, x0, y0):
    """8x8 block with edge replication past the plane boundary."""
    return [
        [plane[min(y0 + y, h - 1)][min(x0 + x, w - 1)] for x in range(8)]
        for y in range(8)
    ]


def _entropy_ops(zz, dc_pred, dc_tbl, ac_tbl):
    """One block's (symbol/bit) op list + updated DC predictor."""
    ops = []
    diff = zz[0] - dc_pred
    s = abs(diff).bit_length()
    ops.append(("sym", dc_tbl, s))
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        ops.append(("bits", v & ((1 << s) - 1), s))
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            ops.append(("sym", ac_tbl, 0xF0))  # ZRL
            run -= 16
        s = abs(zz[k]).bit_length()
        ops.append(("sym", ac_tbl, (run << 4) | s))
        v = zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1
        ops.append(("bits", v & ((1 << s) - 1), s))
        run = 0
    if run:
        ops.append(("sym", ac_tbl, 0x00))  # EOB
    return ops, zz[0]


def _encode_baseline_jpeg(y_plane, w, h, color=False, sub=(2, 2), restart=0):
    """Minimal T.81 baseline encoder: luma from y_plane, flat-128 chroma
    when color=True (Y sampled at ``sub``, chroma 1x1), quant tables all
    1s, one canonical fixed-length-8 Huffman table per (class, dest)."""
    import struct

    hs, vs = sub if color else (1, 1)
    mcus_x = (w + 8 * hs - 1) // (8 * hs)
    mcus_y = (h + 8 * vs - 1) // (8 * vs)
    # per-MCU op streams (table ids: 0=DC-Y 1=AC-Y 2=DC-C 3=AC-C)
    mcu_ops = []
    dc = {"y": 0, "cb": 0, "cr": 0}
    n_since_rst = 0
    for myi in range(mcus_y):
        for mxi in range(mcus_x):
            if restart and (myi * mcus_x + mxi) and n_since_rst == restart:
                dc = {"y": 0, "cb": 0, "cr": 0}
                n_since_rst = 0
                mcu_ops.append("RST")
            ops = []
            for by in range(vs):
                for bx in range(hs):
                    blk = _block_at(
                        y_plane, w, h, (mxi * hs + bx) * 8, (myi * vs + by) * 8
                    )
                    o, dc["y"] = _entropy_ops(
                        _fdct_quant_zigzag(blk), dc["y"], 0, 1
                    )
                    ops += o
            if color:
                flat = [[128] * 8 for _ in range(8)]
                for c in ("cb", "cr"):
                    o, dc[c] = _entropy_ops(
                        _fdct_quant_zigzag(flat), dc[c], 2, 3
                    )
                    ops += o
            mcu_ops.append(ops)
            n_since_rst += 1
    # canonical tables: every used symbol gets a length-8 code
    used = {0: set(), 1: set(), 2: set(), 3: set()}
    for ops in mcu_ops:
        if ops == "RST":
            continue
        for op in ops:
            if op[0] == "sym":
                used[op[1]].add(op[2])
    codes = {t: {s: i for i, s in enumerate(sorted(vals))} for t, vals in used.items()}

    def dht(tc, th, tbl_id):
        vals = sorted(used[tbl_id])
        bits = [0] * 16
        bits[7] = len(vals)
        body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
    if color:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([1]) + bytes([1] * 64)
    nc = 3 if color else 1
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    sof += bytes([1, hs << 4 | vs, 0])
    if color:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += dht(0, 0, 0) + dht(1, 0, 1)
    if color:
        out += dht(0, 1, 2) + dht(1, 1, 3)
    if restart:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart)
    sos = bytes([nc, 1, 0x00])
    if color:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    wtr = _JpegBitWriter()
    rst_n = 0
    for ops in mcu_ops:
        if ops == "RST":
            out += wtr.flush()
            out += bytes([0xFF, 0xD0 + (rst_n % 8)])
            rst_n += 1
            continue
        for op in ops:
            if op[0] == "sym":
                _, tbl_id, sym = op
                wtr.emit(codes[tbl_id][sym], 8)
            else:
                _, v, length = op
                wtr.emit(v, length)
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _gradient_plane(w, h):
    return [[(3 * x + 7 * y) % 256 for x in range(w)] for y in range(h)]


def _plane_mean(plane, w, h):
    return sum(sum(row) for row in plane) / (w * h) / 255.0


def test_jpeg_decode_gray_roundtrip():
    """Grayscale baseline JPEG from the in-test encoder: exact dims, mean
    luma within DCT round-off of the source plane (quant = 1s)."""
    from mover_spark.operators.multimodal import _jpeg_decode

    w, h = 16, 12
    plane = _gradient_plane(w, h)
    got_w, got_h, luma = _jpeg_decode(_encode_baseline_jpeg(plane, w, h))
    assert (got_w, got_h) == (w, h)
    assert abs(luma - _plane_mean(plane, w, h)) < 1.5 / 255


def test_jpeg_decode_420_multi_mcu_edge_crop():
    """4:2:0 color across multiple MCUs with w/h NOT multiples of 16: the
    padded MCU pixels must be excluded from the mean, and the chroma
    blocks must advance the bitstream without disturbing luma."""
    from mover_spark.operators.multimodal import _jpeg_decode

    w, h = 20, 18
    plane = _gradient_plane(w, h)
    data = _encode_baseline_jpeg(plane, w, h, color=True, sub=(2, 2))
    got_w, got_h, luma = _jpeg_decode(data)
    assert (got_w, got_h) == (w, h)
    assert abs(luma - _plane_mean(plane, w, h)) < 1.5 / 255


def test_jpeg_gray_with_declared_2x2_sampling_is_noninterleaved():
    """ADVICE r12 / ITU T.81 A.2: a single-component scan is
    NON-interleaved — MCU = one 8x8 block regardless of the SOF's
    declared sampling factors. A grayscale file declaring 2x2 sampling
    must decode identically to the 1x1 encoding (the pre-fix decoder
    read 4 blocks per MCU and underran the bitstream)."""
    from mover_spark.operators.multimodal import _jpeg_decode

    w, h = 24, 16
    plane = _gradient_plane(w, h)
    data = bytearray(_encode_baseline_jpeg(plane, w, h))
    sof = data.index(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) nc(1) cid(1) -> hv byte
    assert data[sof + 11] == 0x11
    data[sof + 11] = 0x22  # declare 2x2 sampling on the lone component
    got_w, got_h, luma = _jpeg_decode(bytes(data))
    assert (got_w, got_h) == (w, h)
    assert abs(luma - _plane_mean(plane, w, h)) < 1.5 / 255


def test_jpeg_decode_with_restart_markers():
    """DRI/RSTn: predictors reset and byte-aligned restart segments decode
    to the same mean as the unsegmented stream."""
    from mover_spark.operators.multimodal import _jpeg_decode

    w, h = 32, 16  # 2x1 grid of 16x16 MCUs at 4:2:0 -> restart every MCU
    plane = _gradient_plane(w, h)
    plain = _jpeg_decode(_encode_baseline_jpeg(plane, w, h, color=True))
    rst = _jpeg_decode(
        _encode_baseline_jpeg(plane, w, h, color=True, restart=1)
    )
    assert plain[:2] == rst[:2] == (w, h)
    assert abs(plain[2] - rst[2]) < 1e-9
    assert abs(rst[2] - _plane_mean(plane, w, h)) < 1.5 / 255


def test_jpeg_arm_in_image_features(spark):
    """Real baseline-JPEG bytes decode through the 'jpeg-stdlib' arm in
    the mapInPandas chain; a MALFORMED progressive stream (a baseline
    scan merely relabeled SOF2 — its Ss=0/Se=63 scan header is illegal
    in progressive mode) degrades to fake — the same explicit-fallback
    contract as the other stdlib arms. Well-formed progressive decodes
    for real since round 13 (see the tests below)."""
    w, h = 16, 12
    plane = _gradient_plane(w, h)
    good = _encode_baseline_jpeg(plane, w, h, color=True)
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    media = spark.createDataFrame(
        [(1, "image", good), (2, "image", progressive)],
        "media_id long, media_type string, content binary",
    )
    rows = {r.media_id: r for r in image_features(media).collect()}
    try:
        import PIL  # noqa: F401

        assert rows[1].decoder in ("pil", "jpeg-stdlib")
    except ImportError:
        assert rows[1].decoder == "jpeg-stdlib"
        assert (rows[1].width, rows[1].height) == (w, h)
        assert abs(rows[1].mean_luma - _plane_mean(plane, w, h)) < 1.5 / 255
    assert rows[2].decoder in ("pil", "fake")  # PIL can do progressive


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2) decode (round 13)
# ---------------------------------------------------------------------------


def _enc_dc_first(blocks, al, tbl, preds, key):
    """Ops for a progressive first DC scan slice: diff-coded arithmetic-
    shifted DC values (T.81 G.1.2.1). ``preds`` carries the predictor
    across interleaved MCU slices."""
    ops = []
    for zz in blocks:
        v = zz[0] >> al
        diff = v - preds[key]
        preds[key] = v
        s = abs(diff).bit_length()
        ops.append(("sym", tbl, s))
        if s:
            enc = diff if diff >= 0 else diff + (1 << s) - 1
            ops.append(("bits", enc & ((1 << s) - 1), s))
    return ops


def _enc_dc_refine(blocks, al):
    """Ops for a DC successive-approximation refinement scan: one raw
    bit per block (no Huffman)."""
    return [("bits", (zz[0] >> al) & 1, 1) for zz in blocks]


def _enc_ac_first(blocks, ss, se, al, tbl):
    """Ops for a progressive first AC scan (T.81 G.1.2.2): zero runs,
    ZRL, and EOBn end-of-band runs over the point-transformed band."""
    ops = []
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if not eobrun:
            return
        rb = eobrun.bit_length() - 1
        ops.append(("sym", tbl, rb << 4))
        if rb:
            ops.append(("bits", eobrun - (1 << rb), rb))
        eobrun = 0

    for zz in blocks:
        r = 0
        for k in range(ss, se + 1):
            t = abs(zz[k]) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                ops.append(("sym", tbl, 0xF0))
                r -= 16
            s = t.bit_length()
            ops.append(("sym", tbl, (r << 4) | s))
            v = t if zz[k] > 0 else (1 << s) - 1 - t
            ops.append(("bits", v, s))
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return ops


def _enc_ac_refine(blocks, ss, se, al, tbl):
    """Ops for an AC successive-approximation refinement scan (T.81
    G.1.2.3, the jcphuff.c procedure): newly-significant coefficients as
    (run,1)+sign, correction bits for history-nonzero coefficients
    buffered behind the symbol (or EOBn) whose walk covers them, ZRLs
    not emitted when foldable into the EOB run."""
    ops = []
    eobrun = 0
    eob_br: list[int] = []

    def flush_eob():
        nonlocal eobrun, eob_br
        if eobrun:
            rb = eobrun.bit_length() - 1
            ops.append(("sym", tbl, rb << 4))
            if rb:
                ops.append(("bits", eobrun - (1 << rb), rb))
            eobrun = 0
        ops.extend(("bits", b, 1) for b in eob_br)
        eob_br = []

    for zz in blocks:
        temps = [abs(zz[k]) >> al for k in range(ss, se + 1)]
        eob_k = 0  # band index AFTER the last newly-significant coef
        for i, t in enumerate(temps):
            if t == 1:
                eob_k = i + 1
        r = 0
        br: list[int] = []
        for i, t in enumerate(temps):
            if t == 0:
                r += 1
                continue
            while r > 15 and i < eob_k:
                flush_eob()
                ops.append(("sym", tbl, 0xF0))
                r -= 16
                ops.extend(("bits", b, 1) for b in br)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush_eob()
            ops.append(("sym", tbl, (r << 4) | 1))
            ops.append(("bits", 1 if zz[ss + i] > 0 else 0, 1))
            ops.extend(("bits", b, 1) for b in br)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            eob_br.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return ops


def _encode_progressive_jpeg(y_plane, w, h, color=False, sub=(2, 2)):
    """Minimal T.81 progressive (SOF2) encoder exercising the full Annex
    G surface: interleaved first+refinement DC scans, spectral-selection
    AC bands, a two-step successive-approximation ladder on luma AC
    (Al 1 -> 0), EOB runs (the flat-128 chroma bands are pure EOBn), and
    ZRL-in-refinement. Same fixtures/tables as _encode_baseline_jpeg
    (quant all 1s, canonical fixed-length-8 Huffman), so the final
    coefficients must reconstruct EXACTLY."""
    import struct

    hs, vs = sub if color else (1, 1)
    mcus_x = (w + 8 * hs - 1) // (8 * hs)
    mcus_y = (h + 8 * vs - 1) // (8 * vs)
    stride_y = mcus_x * hs
    # luma coefficient blocks over the PADDED grid (interleaved DC scans
    # cover padding blocks; AC scans cover only the real grid)
    y_blocks = [
        _fdct_quant_zigzag(_block_at(y_plane, w, h, bxi * 8, byi * 8))
        for byi in range(mcus_y * vs)
        for bxi in range(stride_y)
    ]
    bw_y, bh_y = (w + 7) // 8, (h + 7) // 8
    y_real = [
        y_blocks[byi * stride_y + bxi]
        for byi in range(bh_y)
        for bxi in range(bw_y)
    ]
    zero_blk = [0] * 64
    # scan list: (ns components [(cid, td, ta)], ss, se, ah, al, ops)
    scans = []
    preds = {"y": 0, "cb": 0, "cr": 0}
    if color:
        # interleaved DC first scan at Al=1: MCU walk, per-comp blocks
        dc_ops = []
        for myi in range(mcus_y):
            for mxi in range(mcus_x):
                mcu_y_blocks = [
                    y_blocks[(myi * vs + by) * stride_y + (mxi * hs + bx)]
                    for by in range(vs)
                    for bx in range(hs)
                ]
                dc_ops += _enc_dc_first(mcu_y_blocks, 1, 0, preds, "y")
                dc_ops += _enc_dc_first([zero_blk], 1, 2, preds, "cb")
                dc_ops += _enc_dc_first([zero_blk], 1, 2, preds, "cr")
        scans.append(
            ([(1, 0, 0), (2, 1, 1), (3, 1, 1)], 0, 0, 0, 1, dc_ops)
        )
        # interleaved DC refinement at Al=0
        rf_ops = []
        for myi in range(mcus_y):
            for mxi in range(mcus_x):
                mcu_y_blocks = [
                    y_blocks[(myi * vs + by) * stride_y + (mxi * hs + bx)]
                    for by in range(vs)
                    for bx in range(hs)
                ]
                rf_ops += _enc_dc_refine(mcu_y_blocks, 0)
                rf_ops += _enc_dc_refine([zero_blk], 0)
                rf_ops += _enc_dc_refine([zero_blk], 0)
        scans.append(
            ([(1, 0, 0), (2, 1, 1), (3, 1, 1)], 0, 0, 1, 0, rf_ops)
        )
        n_chroma_blocks = mcus_x * mcus_y
        chroma_band = [zero_blk] * n_chroma_blocks
        scans.append(
            ([(2, 1, 1)], 1, 63, 0, 0, _enc_ac_first(chroma_band, 1, 63, 0, 3))
        )
        scans.append(
            ([(3, 1, 1)], 1, 63, 0, 0, _enc_ac_first(chroma_band, 1, 63, 0, 3))
        )
    else:
        scans.append(
            ([(1, 0, 0)], 0, 0, 0, 1, _enc_dc_first(y_real, 1, 0, preds, "y"))
        )
        scans.append(([(1, 0, 0)], 0, 0, 1, 0, _enc_dc_refine(y_real, 0)))
    # luma AC: split spectral bands, two-step successive approximation
    for lo, hi in ((1, 5), (6, 63)):
        scans.append(
            ([(1, 0, 0)], lo, hi, 0, 1, _enc_ac_first(y_real, lo, hi, 1, 1))
        )
    for lo, hi in ((1, 5), (6, 63)):
        scans.append(
            ([(1, 0, 0)], lo, hi, 1, 0, _enc_ac_refine(y_real, lo, hi, 0, 1))
        )
    # canonical tables: every used symbol gets a length-8 code
    used = {0: set(), 1: set(), 2: set(), 3: set()}
    for _comps, _ss, _se, _ah, _al, ops in scans:
        for op in ops:
            if op[0] == "sym":
                used[op[1]].add(op[2])
    for t in used:
        used[t].add(0)  # never emit an empty DHT
    codes = {
        t: {s: i for i, s in enumerate(sorted(vals))}
        for t, vals in used.items()
    }

    def dht(tc, th, tbl_id):
        vals = sorted(used[tbl_id])
        bits = [0] * 16
        bits[7] = len(vals)
        body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
    if color:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([1]) + bytes([1] * 64)
    nc = 3 if color else 1
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    sof += bytes([1, hs << 4 | vs, 0])
    if color:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += dht(0, 0, 0) + dht(1, 0, 1)
    if color:
        out += dht(0, 1, 2) + dht(1, 1, 3)
    for scomps, ss, se, ah, al, ops in scans:
        sos = bytes([len(scomps)])
        for cid, td, ta in scomps:
            sos += bytes([cid, td << 4 | ta])
        sos += bytes([ss, se, ah << 4 | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        wtr = _JpegBitWriter()
        for op in ops:
            if op[0] == "sym":
                _, tbl_id, sym = op
                wtr.emit(codes[tbl_id][sym], 8)
            else:
                _, v, length = op
                wtr.emit(v, length)
        out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_gray_matches_baseline():
    """Progressive (SOF2) grayscale: multi-scan coefficient assembly with
    a DC successive-approximation ladder and split AC bands must
    reconstruct EXACTLY the coefficients of the baseline encoding of the
    same plane (quant 1s), so the decoded mean luma matches to float
    round-off."""
    from mover_spark.operators.multimodal import _jpeg_decode

    w, h = 20, 14  # non-multiple-of-8: real-window crop in both axes
    plane = _gradient_plane(w, h)
    base = _jpeg_decode(_encode_baseline_jpeg(plane, w, h))
    prog = _jpeg_decode(_encode_progressive_jpeg(plane, w, h))
    assert prog[:2] == (w, h)
    assert abs(prog[2] - base[2]) < 1e-9
    assert abs(prog[2] - _plane_mean(plane, w, h)) < 1.5 / 255


def test_jpeg_progressive_420_interleaved_dc_and_eob_runs():
    """Progressive 4:2:0 color: interleaved DC first+refinement scans
    over the padded MCU grid, non-interleaved luma AC scans over the
    REAL block grid (odd block count != padded stride), and all-zero
    chroma bands encoded as pure EOBn runs spanning many blocks."""
    from mover_spark.operators.multimodal import _jpeg_decode

    w, h = 24, 18  # luma 3x3 blocks real vs 4x2-MCU padded grid
    plane = _gradient_plane(w, h)
    base = _jpeg_decode(_encode_baseline_jpeg(plane, w, h, color=True))
    prog = _jpeg_decode(_encode_progressive_jpeg(plane, w, h, color=True))
    assert prog[:2] == (w, h)
    assert abs(prog[2] - base[2]) < 1e-9


def test_jpeg_progressive_refinement_paths():
    """A sparse high-contrast plane drives the refinement-scan corner
    paths: ZRL-in-refinement (>=16 zero-history gaps between newly-
    significant coefficients), correction bits buffered behind EOBn
    runs, and blocks whose band is corrections-only."""
    from mover_spark.operators.multimodal import _jpeg_decode

    w, h = 32, 16
    plane = [[0] * w for _ in range(h)]
    plane[3][5] = 255  # isolated impulses -> dense high-frequency spectra
    plane[12][27] = 200
    plane[8][16] = 90
    base = _jpeg_decode(_encode_baseline_jpeg(plane, w, h))
    prog = _jpeg_decode(_encode_progressive_jpeg(plane, w, h))
    assert prog[:2] == (w, h)
    assert abs(prog[2] - base[2]) < 1e-9


def test_jpeg_progressive_random_planes_match_baseline():
    """Property: for ANY plane, the progressive encoding reconstructs
    the same coefficients as the baseline encoding (quant 1s, lossless
    successive-approximation ladder), so the decoded luma agrees to
    float round-off. Random planes + random dims sweep symbol mixes the
    hand-picked fixtures may miss (long runs, dense spectra, every
    (run,size) pair)."""
    import random

    from mover_spark.operators.multimodal import _jpeg_decode

    rng = random.Random(1307)
    for trial in range(6):
        w = rng.randrange(8, 40)
        h = rng.randrange(8, 40)
        style = trial % 3
        if style == 0:  # white noise: dense spectra, big symbols
            plane = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        elif style == 1:  # mostly flat + impulses: long zero runs, EOBs
            plane = [[128] * w for _ in range(h)]
            for _ in range(rng.randrange(1, 6)):
                plane[rng.randrange(h)][rng.randrange(w)] = rng.choice([0, 255])
        else:  # smooth gradient: low-frequency energy only
            plane = [
                [(x * 5 + y * 3) % 256 for x in range(w)] for y in range(h)
            ]
        color = bool(trial % 2)
        base = _jpeg_decode(_encode_baseline_jpeg(plane, w, h, color=color))
        prog = _jpeg_decode(_encode_progressive_jpeg(plane, w, h, color=color))
        assert prog[:2] == (w, h), (trial, w, h)
        assert abs(prog[2] - base[2]) < 1e-9, (trial, w, h, prog[2], base[2])


def test_jpeg_progressive_arm_in_image_features(spark):
    """Real progressive-JPEG bytes decode through the 'jpeg-stdlib' arm
    in the mapInPandas chain (VERDICT r12 missing #2: progressive is
    common in web-crawl corpora and used to degrade to the fake arm)."""
    try:
        import PIL  # noqa: F401

        return  # PIL arm would shadow the stdlib path
    except ImportError:
        pass
    w, h = 16, 12
    plane = _gradient_plane(w, h)
    media = spark.createDataFrame(
        [(1, "image", _encode_progressive_jpeg(plane, w, h, color=True))],
        "media_id long, media_type string, content binary",
    )
    row = image_features(media).collect()[0]
    assert row.decoder == "jpeg-stdlib"
    assert (row.width, row.height) == (w, h)
    assert abs(row.mean_luma - _plane_mean(plane, w, h)) < 1.5 / 255


# ---------------------------------------------------------------------------
# real-bytes video arm: MJPEG-in-AVI (round 13)
# ---------------------------------------------------------------------------

def _encode_mjpeg_avi(jpeg_frames, w, h, us_per_frame=40000):
    """Minimal RIFF/AVI wrapper around pre-encoded JPEG frames (public
    'AVI RIFF File Reference' layout): RIFF('AVI ' LIST('hdrl' avih)
    LIST('movi' 00dc...)). Enough structure for the container walk —
    no stream headers or idx1 (both optional for the parser)."""
    import struct

    def chunk(fourcc, data):
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    avih = struct.pack(
        "<10I",
        us_per_frame,      # dwMicroSecPerFrame
        0, 0, 0,
        len(jpeg_frames),  # dwTotalFrames
        0, 1, 0,
        w, h,
    ) + b"\x00" * 16
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(
        b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_mjpeg_parse_real_bytes():
    """The container walk recovers dims, frame period, and every JPEG
    payload; truncated bytes and non-AVI RIFF raise (degrade contract)."""
    import pytest

    from mover_spark.operators.multimodal import _avi_mjpeg_frames

    w, h = 16, 12
    frames = [
        _encode_baseline_jpeg(_gradient_plane(w, h), w, h) for _ in range(5)
    ]
    avi = _encode_mjpeg_avi(frames, w, h, us_per_frame=33333)
    gw, gh, uspf, got = _avi_mjpeg_frames(avi)
    assert (gw, gh, uspf) == (w, h, 33333)
    assert got == frames
    with pytest.raises(ValueError):
        _avi_mjpeg_frames(avi[:40])  # truncated inside hdrl
    with pytest.raises(ValueError):
        _avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00WAVE")  # RIFF, not AVI


def test_video_features_real_avi_and_fake_mix(spark):
    """End-to-end real-bytes video chain: an MJPEG AVI with frames of
    DIFFERENT brightness decodes through 'avi-mjpeg-stdlib' (true frame
    count/duration from the container, sampled luma mean/spread from the
    T.81 decoder); opaque bytes degrade to the deterministic fake arm
    with metadata-derived duration."""
    from mover_spark.operators.multimodal import video_features

    w, h = 16, 16
    # 6 frames at 10 fps: 3 dark then 3 bright -> nonzero luma_spread
    dark = [[40] * w for _ in range(h)]
    bright = [[200] * w for _ in range(h)]
    frames = [
        _encode_baseline_jpeg(p, w, h) for p in ([dark] * 3 + [bright] * 3)
    ]
    avi = _encode_mjpeg_avi(frames, w, h, us_per_frame=100_000)
    media = spark.createDataFrame(
        [
            (1, "video", avi, None),
            (2, "video", b"not a container", 2000),
            (3, "image", avi, None),  # wrong modality: excluded
        ],
        "media_id long, media_type string, content binary, duration_ms long",
    )
    rows = {r.media_id: r for r in video_features(media, every_ms=200).collect()}
    assert set(rows) == {1, 2}
    real = rows[1]
    assert real.decoder == "avi-mjpeg-stdlib"
    assert (real.width, real.height) == (w, h)
    assert real.n_frames == 6 and real.duration_ms == 600
    # every_ms=200 at 100ms/frame -> step 2 -> frames 0,2,4 sampled
    assert real.n_sampled == 3
    # sampled frames 0,2 dark (luma 40) and 4 bright (luma 200)
    assert abs(real.mean_luma - ((40 + 40 + 200) / 3) / 255) < 2 / 255
    assert real.luma_spread > 0.5  # dark vs bright frames
    fake = rows[2]
    assert fake.decoder == "fake"
    assert fake.duration_ms == 2000 and fake.n_frames == 51  # 2000//40+1
    assert fake.n_sampled == 11 and fake.luma_spread == 0.0
    # determinism across runs
    again = {
        r.media_id: r for r in video_features(media, every_ms=200).collect()
    }
    assert sorted(map(tuple, rows.values())) == sorted(map(tuple, again.values()))
