"""Multimodal column operators: images/audio/video as opaque
``binary`` columns with typed metadata (BASELINE.json north star; the
reference's types stop at one array<struct> level, SURVEY.md §1.2).

The pattern at 100 TB: keep payloads as binary alongside metadata
columns; run metadata ops (size, hash, magic sniffing, validity)
JVM-side on built-ins; push codec work (decode / resize /
frame-sample) through Arrow-batched ``mapInPandas`` so each Python
worker gets columnar batches, and size partitions so a batch of
payloads fits executor memory (``spark.sql.files.maxPartitionBytes``
down, or ``repartition`` up, for multi-MB payloads).

Codec status (r09): three REAL dependency-free codecs are wired —
mono PCM16 WAV (:func:`pcm16_wav_blob` / :func:`decode_wav_stats`),
uncompressed 24bpp BMP (:func:`bmp24_blob` / :func:`decode_bmp_stats`)
and COMPRESSED non-interlaced 8-bit RGB/RGBA PNG
(:func:`png_rgb8_blob` / :func:`decode_png_stats` — stdlib zlib
inflate, all five scanline filters, mandatory chunk CRCs), each
encoding JVM-side and decoding with numpy, driver-gated against
blob-free oracles. DCT/entropy-coded formats (JPEG/MP4/...) remain
behind
``NotImplementedError`` seams with deterministic ``fake`` stand-ins
(this container ships no PIL/ffmpeg); the Spark plumbing — schema,
Arrow batching, UDF signatures, 1:1 null contracts — is identical
either way.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def with_binary_payload(
    df: DataFrame, text_col: str, out_col: str = "payload"
) -> DataFrame:
    """Synthesize a binary payload column from text (UTF-8 bytes) —
    the fixture path standing in for real image/audio bytes."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def binary_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Metadata over an opaque binary column, all JVM built-ins:
    byte length, content md5 (dedup key for exact payload dedup), and
    the first-4-bytes magic prefix (format sniffing: JPEG FFD8FFE0,
    PNG 89504E47, ...). No shuffle — pure projection."""
    b = F.col(bin_col)
    return df.select(
        F.col(id_col),
        F.length(b).cast("long").alias("n_bytes"),
        F.md5(b).alias("content_md5"),
        # slice the 4 bytes BEFORE hex — hex(payload) would materialize
        # a string 2x a multi-MB payload just to keep 8 chars
        F.hex(F.substring(b, 1, 4)).alias("magic_hex"),
    )


def decode_features(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    dim: int = 8,
    backend: str = "fake",
) -> DataFrame:
    """Decode binary payloads to fixed-width feature vectors via
    Arrow-batched ``mapInPandas``.

    ``backend="fake"``: deterministic features — byte i of the
    payload scaled to [0,1], zero-padded to ``dim`` (schema/batching
    identical to a real decoder). Any other backend raises
    ``NotImplementedError``: that seam is where a codec (PIL decode →
    resize → channel means; ffmpeg frame-sample) plugs in unchanged.
    """
    if backend != "fake":
        raise NotImplementedError(
            f"decode backend {backend!r}: real codecs (PIL/ffmpeg/torchaudio) "
            "are not available in this environment; only the deterministic "
            "'fake' backend is wired"
        )
    id_type = df.schema[id_col].dataType
    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("n_bytes", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[bin_col]
            feats = [
                [(b[i] / 255.0) if i < len(b) else 0.0 for i in range(dim)]
                if b is not None
                else None
                for b in payloads
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [len(b) if b is not None else 0 for b in payloads],
                    "features": feats,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, schema)


def _le_hex(col, nbytes: int):
    """Little-endian hex rendering of a non-negative integral Column
    (uint8 pairs, LSB first) — the building block for fixed-offset
    binary formats, all JVM expression."""
    parts = [
        F.format_string(
            "%02X",
            (col.cast("long") / F.lit(256 ** i)).cast("long") % 256,
        )
        for i in range(nbytes)
    ]
    return F.concat(*parts)


def pcm16_wav_blob(samples, sample_rate: int = 8000):
    """Canonical 44-byte-header mono PCM16 WAV blob from an
    ``array<int>`` Column of samples — encoded ENTIRELY JVM-side
    (hex assembly + one ``unhex``), so building a million audio
    payloads is a projection, not a Python pass. Samples are taken
    mod 2^16 (two's-complement int16 wire format).

    This is the fixture-synthesis half of the audio path: the decode
    half (:func:`decode_wav_stats`) parses the BYTES back by offset
    per the public RIFF/WAVE spec — an independent numpy
    implementation, so an encoder/decoder disagreement (offset,
    endianness, header size) surfaces as a value mismatch."""
    data_hex = F.array_join(
        F.transform(samples, lambda x: _le_hex(F.pmod(x, F.lit(65536)), 2)),
        "",
    )
    data_size = (F.size(samples) * 2).cast("long")
    byte_rate = sample_rate * 2  # mono, 2 bytes/sample
    header_hex = F.concat(
        F.lit("52494646"),            # "RIFF"
        _le_hex(data_size + 36, 4),   # chunk size
        F.lit("57415645"),            # "WAVE"
        F.lit("666D7420"),            # "fmt "
        F.lit("10000000"),            # fmt chunk size = 16
        F.lit("0100"),                # audio format = 1 (PCM)
        F.lit("0100"),                # channels = 1
        _le_hex(F.lit(sample_rate), 4),
        _le_hex(F.lit(byte_rate), 4),
        F.lit("0200"),                # block align = 2
        F.lit("1000"),                # bits per sample = 16
        F.lit("64617461"),            # "data"
        _le_hex(data_size, 4),
    )
    return F.unhex(F.concat(header_hex, data_hex))


def decode_wav_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL dependency-free audio decode: parse mono PCM16 WAV bytes
    by fixed offset (RIFF/WAVE public spec — magic tags, fmt chunk,
    sample rate, bits, data size) and emit per-payload sample stats.
    Arrow-batched ``mapInPandas``; numpy ``frombuffer`` does the
    int16-LE work, so a batch decodes at memcpy speed.

    Output (1:1 with input; malformed/NULL payloads → NULL stats,
    never dropped rows): ``n_samples``, ``sample_rate``,
    ``peak_abs`` (max |sample|), ``sum_amp`` (exact int64 — callers
    derive means JVM-side so float rounding stays in ONE engine).

    Unlike the ``fake`` feature backend this is a real codec for a
    real public format; JPEG/MP4 remain behind the
    ``NotImplementedError`` seam (no codecs in this container)."""
    id_type = df.schema[id_col].dataType
    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("n_samples", LongType()),
            StructField("sample_rate", LongType()),
            StructField("peak_abs", LongType()),
            StructField("sum_amp", LongType()),
        ]
    )

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def one(b):
            if b is None or len(b) < 44:
                return (None, None, None, None)
            bb = bytes(b)
            if (
                bb[0:4] != b"RIFF"
                or bb[8:12] != b"WAVE"
                or bb[12:16] != b"fmt "
                or int.from_bytes(bb[20:22], "little") != 1   # PCM
                or int.from_bytes(bb[22:24], "little") != 1   # mono
                or int.from_bytes(bb[34:36], "little") != 16  # bits
                or bb[36:40] != b"data"
            ):
                return (None, None, None, None)
            rate = int.from_bytes(bb[24:28], "little")
            dsize = int.from_bytes(bb[40:44], "little")
            raw = bb[44 : 44 + dsize]
            if len(raw) < dsize or dsize % 2:
                return (None, None, None, None)  # truncated payload
            s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            if len(s) == 0:
                return (0, rate, None, None)
            return (len(s), rate, int(np.abs(s).max()), int(s.sum()))

        for pdf in batches:
            stats = [one(b) for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_samples": [s[0] for s in stats],
                    "sample_rate": [s[1] for s in stats],
                    "peak_abs": [s[2] for s in stats],
                    "sum_amp": [s[3] for s in stats],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, schema)


def bmp24_blob(width, height, pixel):
    """Canonical 54-byte-header uncompressed 24bpp BMP blob, encoded
    ENTIRELY JVM-side. ``width``/``height`` are positive int Columns;
    ``pixel(x, y, c)`` returns the byte value (0-255 Column) of
    channel ``c`` (0=B, 1=G, 2=R — BMP is BGR) at image coordinates
    (x, y) with y=0 the TOP row. Rows are emitted bottom-up with
    4-byte padding, per the public spec — the decoder
    (:func:`decode_bmp_stats`) re-derives both from the raw bytes."""
    pad = (4 - (width * 3) % 4) % 4
    row_hex = lambda y: F.concat(  # noqa: E731
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), width - 1),
                lambda x: F.concat(
                    F.format_string("%02X", pixel(x, y, F.lit(0))),
                    F.format_string("%02X", pixel(x, y, F.lit(1))),
                    F.format_string("%02X", pixel(x, y, F.lit(2))),
                ),
            ),
            "",
        ),
        F.repeat(F.lit("00"), pad),
    )
    img_size = ((width * 3 + pad) * height).cast("long")
    header_hex = F.concat(
        F.lit("424D"),                       # "BM"
        _le_hex(img_size + 54, 4),           # file size
        F.lit("00000000"),                   # reserved
        _le_hex(F.lit(54), 4),               # pixel data offset
        _le_hex(F.lit(40), 4),               # DIB header size
        _le_hex(width.cast("long"), 4),      # width (positive)
        _le_hex(height.cast("long"), 4),     # height (bottom-up)
        F.lit("0100"),                       # planes = 1
        F.lit("1800"),                       # bpp = 24
        _le_hex(F.lit(0), 4),                # compression = BI_RGB
        _le_hex(img_size, 4),
        _le_hex(F.lit(2835), 4),             # x ppm
        _le_hex(F.lit(2835), 4),             # y ppm
        _le_hex(F.lit(0), 4),                # palette colors
        _le_hex(F.lit(0), 4),                # important colors
    )
    # bottom-up row order: memory row 0 is image row height-1
    body_hex = F.array_join(
        F.transform(F.sequence(height - 1, F.lit(0), F.lit(-1)), row_hex), ""
    )
    return F.unhex(F.concat(header_hex, body_hex))


def decode_bmp_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL dependency-free image decode: parse uncompressed 24bpp
    BMP bytes by fixed offset (public BITMAPFILEHEADER/
    BITMAPINFOHEADER spec — magic, pixel offset, dimensions, planes,
    bpp, compression), honoring row PADDING and BOTTOM-UP row order,
    and emit per-payload pixel stats via Arrow-batched
    ``mapInPandas`` + numpy reshape (memcpy-speed per batch).

    Output (1:1; malformed/NULL payloads → NULL stats): ``width``,
    ``height``, per-channel exact byte sums ``sum_b/sum_g/sum_r``
    (means derive JVM-side), and ``top_row_sum`` — the byte sum of
    the TOP image row, which is the LAST memory row: a decoder that
    ignores bottom-up order or row padding gets this wrong even when
    the whole-image sums accidentally agree."""
    id_type = df.schema[id_col].dataType
    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("sum_b", LongType()),
            StructField("sum_g", LongType()),
            StructField("sum_r", LongType()),
            StructField("top_row_sum", LongType()),
        ]
    )
    NULLS = (None,) * 6

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def one(b):
            if b is None or len(b) < 54:
                return NULLS
            bb = bytes(b)
            u32 = lambda o: int.from_bytes(bb[o : o + 4], "little")  # noqa: E731
            u16 = lambda o: int.from_bytes(bb[o : o + 2], "little")  # noqa: E731
            if (
                bb[0:2] != b"BM"
                or u32(14) < 40        # DIB header size
                or u16(26) != 1        # planes
                or u16(28) != 24       # bpp
                or u32(30) != 0        # BI_RGB only
            ):
                return NULLS
            off, w, h = u32(10), u32(18), u32(22)
            if w <= 0 or h <= 0 or h > 2**24:  # top-down (negative h) unsupported
                return NULLS
            # pixel offset must clear the 54-byte headers and land in
            # the payload: off=0 would slice header bytes as pixels
            # and return confident garbage instead of the documented
            # malformed -> NULL contract
            if off < 54 or off > len(bb):
                return NULLS
            stride = (3 * w + 3) // 4 * 4
            data = bb[off : off + stride * h]
            if len(data) < stride * h:
                return NULLS  # truncated
            arr = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)
            pix = arr[:, : 3 * w].reshape(h, w, 3).astype(np.int64)
            sums = pix.sum(axis=(0, 1))
            return (w, h, int(sums[0]), int(sums[1]), int(sums[2]),
                    int(pix[h - 1].sum()))  # last memory row = TOP image row

        for pdf in batches:
            stats = [one(b) for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [s[0] for s in stats],
                    "height": [s[1] for s in stats],
                    "sum_b": [s[2] for s in stats],
                    "sum_g": [s[3] for s in stats],
                    "sum_r": [s[4] for s in stats],
                    "top_row_sum": [s[5] for s in stats],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, schema)


def _be_hex(col, nbytes: int):
    """Big-endian hex rendering of a non-negative integral Column —
    PNG's network byte order (chunk lengths, IHDR dims, checksums)."""
    return F.format_string(f"%0{2 * nbytes}X", col.cast("long"))


def _png_chunk_hex(type_hex: str, data_hex, data_len):
    """One PNG chunk as hex: length(BE u32) + type + data +
    crc32(type+data). The CRC is Spark's built-in ``F.crc32`` (same
    ISO-3309 polynomial as ``zlib.crc32``) over the REAL bytes, so a
    single wrong byte anywhere in the assembled stream makes the
    decoder's mandatory CRC check reject the chunk."""
    return F.concat(
        _be_hex(data_len, 4),
        F.lit(type_hex),
        data_hex,
        _be_hex(F.crc32(F.unhex(F.concat(F.lit(type_hex), data_hex))), 4),
    )


def _png_raw_arr(width, height, pixel):
    """The filtered scanline byte array (filter byte + filtered bytes
    per row, all rows flattened) — the exact sequence zlib-inflating
    the IDAT stream must reproduce. Row ``y`` uses filter type
    ``y % 5`` so every image taller than 4 rows exercises all five
    public-spec filters (None/Sub/Up/Average/Paeth), computed as JVM
    expressions from the pixel generator.

    r12: the UNFILTERED pixel rows materialize first and the filter
    pass reads raw/left/up/upper-left via ``element_at`` — the old
    form re-evaluated the caller's ``pixel()`` expression FOUR times
    per filtered byte inside interpreted higher-order functions (the
    dominant cost of the whole encode: 1.43 -> 0.87 s for the raw
    stage at sf0.1, bytes identical). The rows array is let-bound
    through the 1-element transform trick (see pq.py explode_subs) so
    it evaluates once, not once per consumer."""
    w3 = width.cast("int") * 3
    h = height.cast("int")
    rows = F.transform(
        F.sequence(F.lit(0), h - 1),
        lambda y: F.transform(
            F.sequence(F.lit(0), w3 - 1),
            lambda i: pixel(
                F.floor(i / 3).cast("int"), y, (i % 3).cast("int")
            ).cast("int"),
        ),
    )

    def filtered(rws, y, i):
        # i indexes the 3*width filtered bytes of 0-based row y;
        # element_at is 1-based, so row y-1 = element y, byte i-3
        # (the left neighbor, same channel) = element i-2
        cur = F.element_at(rws, y + 1)
        prev = F.element_at(rws, y)
        zero = F.lit(0)
        raw = F.element_at(cur, i + 1)
        left = F.when(i >= 3, F.element_at(cur, i - 2)).otherwise(zero)
        up = F.when(y > 0, F.element_at(prev, i + 1)).otherwise(zero)
        ul = F.when((y > 0) & (i >= 3), F.element_at(prev, i - 2)).otherwise(
            zero
        )
        p = left + up - ul
        pa, pb, pc = F.abs(p - left), F.abs(p - up), F.abs(p - ul)
        paeth = (
            F.when((pa <= pb) & (pa <= pc), left)
            .when(pb <= pc, up)
            .otherwise(ul)
        )
        ft = y % 5
        pred = (
            F.when(ft == 0, zero)
            .when(ft == 1, left)
            .when(ft == 2, up)
            .when(ft == 3, F.floor((left + up) / 2).cast("int"))
            .otherwise(paeth)
        )
        return F.pmod(raw - pred, F.lit(256)).cast("int")

    return F.element_at(
        F.transform(
            F.array(rows),
            lambda rws: F.flatten(
                F.transform(
                    F.sequence(F.lit(0), h - 1),
                    lambda y: F.concat(
                        F.array((y % 5).cast("int")),
                        F.transform(
                            F.sequence(F.lit(0), w3 - 1),
                            lambda i: filtered(rws, y, i),
                        ),
                    ),
                )
            ),
        ),
        1,
    )


def _png_adler(raw_arr):
    """Exact adler32 over the byte array as a sequential
    ``F.aggregate`` (A += d; B += A; both mod 65521 at the end —
    exact while 255·n² < 2^63, i.e. payloads < ~190 MB, far above
    any sane single-image scanline buffer). Returns a struct(a, b)."""
    return F.aggregate(
        raw_arr,
        F.struct(
            F.lit(1).cast("long").alias("a"), F.lit(0).cast("long").alias("b")
        ),
        lambda acc, d: F.struct(
            (acc["a"] + d).alias("a"), (acc["b"] + acc["a"] + d).alias("b")
        ),
        lambda acc: F.struct(
            (acc["a"] % 65521).alias("a"), (acc["b"] % 65521).alias("b")
        ),
    )


def _png_idat_hex(data_hex, adler, n):
    """The zlib stream as hex: header + STORED deflate blocks
    (BTYPE=00 — legal zlib any inflater accepts, chosen because
    Huffman coding is not expressible as a projection; 1-byte
    BFINAL/BTYPE + LEN/NLEN LE u16 per block) + the adler32
    trailer."""
    last_blk = F.floor((n - 1) / 65535).cast("int")
    blocks_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), last_blk),
            lambda k: F.concat(
                F.when(k == last_blk, F.lit("01")).otherwise(F.lit("00")),
                _le_hex(F.least(F.lit(65535), n - k.cast("long") * 65535), 2),
                _le_hex(
                    F.lit(65535)
                    - F.least(F.lit(65535), n - k.cast("long") * 65535),
                    2,
                ),
                data_hex.substr(
                    k.cast("long") * 131070 + 1,
                    F.least(F.lit(65535), n - k.cast("long") * 65535) * 2,
                ),
            ),
        ),
        "",
    )
    return F.concat(
        F.lit("7801"),  # zlib header: deflate, 32k window, no dict
        blocks_hex,
        _be_hex(adler["b"] * 65536 + adler["a"], 4),
    )


def _png_assemble(width, height, idat_hex, n):
    """Signature + IHDR + IDAT + IEND from a ready IDAT hex payload.
    ``idat_hex`` is referenced twice (chunk CRC input and chunk body)
    — callers on the hot path must pass it as a NAMED COLUMN so the
    zlib framing evaluates once (see :func:`encode_png_rgb8`)."""
    idat_len = n + (F.floor((n - 1) / 65535).cast("long") + 1) * 5 + 6
    ihdr_hex = F.concat(
        _be_hex(width.cast("long"), 4),
        _be_hex(height.cast("long"), 4),
        F.lit("08"),        # bit depth
        F.lit("02"),        # color type 2 = truecolor RGB
        F.lit("000000"),    # compression / filter / interlace = 0
    )
    return F.unhex(
        F.concat(
            F.lit("89504E470D0A1A0A"),  # PNG signature
            _png_chunk_hex("49484452", ihdr_hex, F.lit(13)),       # IHDR
            _png_chunk_hex("49444154", idat_hex, idat_len),        # IDAT
            F.lit("0000000049454E44AE426082"),                     # IEND
        )
    )


def png_rgb8_blob(width, height, pixel):
    """Canonical non-interlaced 8-bit RGB PNG blob as ONE Column,
    encoded ENTIRELY JVM-side — the COMPRESSED-format counterpart of
    :func:`bmp24_blob` (VERDICT r08 #4). ``width``/``height`` are
    positive int Columns; ``pixel(x, y, c)`` returns the byte value
    (0-255 Column) of channel ``c`` (0=R, 1=G, 2=B — PNG is RGB) at
    (x, y), y=0 the TOP row (PNG is top-down, the opposite of BMP).
    What makes it a real PNG: all five scanline filters
    (:func:`_png_raw_arr`), a valid zlib stream with an exact
    adler32 (:func:`_png_adler` / :func:`_png_idat_hex`), and real
    chunk CRCs via ``F.crc32`` (:func:`_png_chunk_hex`) that the
    decoder verifies.

    PERFORMANCE: this single-Column form repeats the scanline-build
    subtree ~6x (higher-order functions evaluate interpretively —
    no whole-stage codegen, no cross-lambda subexpression
    elimination — and the byte array feeds hex, adler, length, and
    the twice-referenced IDAT). Fine for tests and one-off blobs;
    bulk encodes MUST use :func:`encode_png_rgb8`, which stages each
    expensive intermediate as a named column evaluated once
    (measured 6-7x faster at 15k images/row batch)."""
    raw_arr = _png_raw_arr(width, height, pixel)
    n = F.size(raw_arr).cast("long")
    data_hex = F.array_join(
        F.transform(raw_arr, lambda b: F.format_string("%02X", b)), ""
    )
    idat_hex = _png_idat_hex(data_hex, _png_adler(raw_arr), n)
    return _png_assemble(width, height, idat_hex, n)


def encode_png_rgb8(
    df: DataFrame, width, height, pixel, out_col: str = "png"
) -> DataFrame:
    """Bulk PNG encode: same bytes as :func:`png_rgb8_blob`
    (test-pinned), staged so each expensive intermediate — the
    filtered scanline array, its hex rendering, the adler32, the
    zlib framing — is a NAMED column evaluated exactly once per row.
    Higher-order functions run interpreted (outside whole-stage
    codegen), so Catalyst's subexpression elimination cannot dedup
    repeated subtrees inside one projection; staging across projects
    is the reliable fix, and CollapseProject keeps the stages apart
    because each alias is non-cheap and multiply-referenced.
    Appends ``out_col`` (binary) and preserves every input column."""
    tmp = "__png_"
    s = df.withColumn(f"{tmp}raw", _png_raw_arr(width, height, pixel))
    raw = F.col(f"{tmp}raw")
    s = s.withColumn(
        f"{tmp}hex",
        F.array_join(F.transform(raw, lambda b: F.format_string("%02X", b)), ""),
    ).withColumn(f"{tmp}ad", _png_adler(raw)).withColumn(
        f"{tmp}n", F.size(raw).cast("long")
    )
    s = s.withColumn(
        f"{tmp}idat",
        _png_idat_hex(F.col(f"{tmp}hex"), F.col(f"{tmp}ad"), F.col(f"{tmp}n")),
    )
    s = s.withColumn(
        out_col,
        _png_assemble(width, height, F.col(f"{tmp}idat"), F.col(f"{tmp}n")),
    )
    return s.drop(f"{tmp}raw", f"{tmp}hex", f"{tmp}ad", f"{tmp}n", f"{tmp}idat")


def decode_png_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL compressed-image decode, stdlib-only: parse PNG bytes per
    the public spec — signature, chunk walk with MANDATORY crc32
    verification, IHDR validation (8-bit, color type 2=RGB or
    6=RGBA, non-interlaced), multi-IDAT concatenation,
    ``zlib.decompress`` of the deflate stream, then the five scanline
    unfilters (None/Sub/Up/Average/Paeth) row by row.

    Output (1:1; malformed/NULL payloads → NULL stats): ``width``,
    ``height``, ``channels`` (3 or 4), exact color-channel byte sums
    ``sum_r/sum_g/sum_b`` (alpha excluded; means derive JVM-side) and
    ``top_row_sum`` — the RGB byte sum of image row 0, the FIRST
    scanline (PNG is top-down where BMP is bottom-up; a decoder
    confusing the two gets this wrong even when whole-image sums
    agree). Filters None/Up are vectorized numpy; Sub/Average/Paeth
    reconstruct sequentially per row (the data dependency is
    inherent — a production decoder moves that loop to C, the
    correctness contract is identical). Arrow-batched
    ``mapInPandas``, no shuffle."""
    id_type = df.schema[id_col].dataType
    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("channels", LongType()),
            StructField("sum_r", LongType()),
            StructField("sum_g", LongType()),
            StructField("sum_b", LongType()),
            StructField("top_row_sum", LongType()),
        ]
    )
    NULLS = (None,) * 7

    def decode(batches: Iterator) -> Iterator:
        import zlib

        import numpy as np
        import pandas as pd

        def one(b):
            if b is None or len(b) < 8:
                return NULLS
            bb = bytes(b)
            if bb[:8] != b"\x89PNG\r\n\x1a\n":
                return NULLS
            pos, ihdr, idat, ended = 8, None, [], False
            idat_done = False  # spec: IDAT chunks must be consecutive
            while pos + 12 <= len(bb):
                ln = int.from_bytes(bb[pos : pos + 4], "big")
                typ = bb[pos + 4 : pos + 8]
                end = pos + 8 + ln
                if end + 4 > len(bb):
                    return NULLS  # truncated chunk
                data = bb[pos + 8 : end]
                crc = int.from_bytes(bb[end : end + 4], "big")
                if zlib.crc32(typ + data) != crc:
                    return NULLS  # corrupt chunk
                if ihdr is None:
                    if typ != b"IHDR":
                        return NULLS  # IHDR must be first
                    ihdr = data
                elif typ == b"IDAT":
                    if idat_done:
                        return NULLS  # non-consecutive IDAT run
                    idat.append(data)
                elif typ == b"IEND":
                    if end + 4 != len(bb):
                        return NULLS  # trailing bytes after IEND
                    ended = True
                    break
                elif idat:
                    idat_done = True
                pos = end + 4
            if ihdr is None or not ended or len(ihdr) != 13:
                return NULLS
            w = int.from_bytes(ihdr[0:4], "big")
            h = int.from_bytes(ihdr[4:8], "big")
            depth, color, comp, filt, inter = ihdr[8:13]
            if (
                w <= 0 or h <= 0 or w * h > 2**26
                or depth != 8 or color not in (2, 6)
                or comp != 0 or filt != 0 or inter != 0
            ):
                return NULLS
            bpp = 3 if color == 2 else 4
            stride = 1 + w * bpp
            # BOUNDED inflate: a malformed payload can declare small
            # dims but carry a high-ratio deflate stream; a plain
            # zlib.decompress would allocate the full decompressed
            # size before the length check, defeating the w*h memory
            # cap. Cap output at stride*h + 1 (one spare byte detects
            # over-long streams without buffering them).
            d = zlib.decompressobj()
            try:
                raw = d.decompress(b"".join(idat), stride * h + 1)
            except zlib.error:
                return NULLS
            if (
                len(raw) != stride * h
                or d.unconsumed_tail
                or not d.eof
                or d.unused_data
            ):
                return NULLS
            lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
            recon = np.zeros((h, w * bpp), dtype=np.uint8)
            prev = np.zeros(w * bpp, dtype=np.uint8)
            for y in range(h):
                ft, line = int(lines[y, 0]), lines[y, 1:]
                if ft == 0:
                    cur = line.copy()
                elif ft == 2:
                    cur = line + prev  # uint8 wraps mod 256
                elif ft in (1, 3, 4):
                    cur = line.astype(np.int64)
                    pv = prev.astype(np.int64)
                    for i in range(w * bpp):
                        left = cur[i - bpp] if i >= bpp else 0
                        if ft == 1:
                            cur[i] = (cur[i] + left) & 0xFF
                        elif ft == 3:
                            cur[i] = (cur[i] + ((left + pv[i]) >> 1)) & 0xFF
                        else:
                            up = pv[i]
                            ul = pv[i - bpp] if i >= bpp else 0
                            p = left + up - ul
                            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                            pred = (
                                left
                                if pa <= pb and pa <= pc
                                else (up if pb <= pc else ul)
                            )
                            cur[i] = (cur[i] + pred) & 0xFF
                    cur = cur.astype(np.uint8)
                else:
                    return NULLS  # invalid filter type
                recon[y] = cur
                prev = recon[y]
            pix = recon.reshape(h, w, bpp).astype(np.int64)
            sums = pix.sum(axis=(0, 1))
            top = int(pix[0, :, :3].sum())
            return (w, h, bpp, int(sums[0]), int(sums[1]), int(sums[2]), top)

        for pdf in batches:
            stats = [one(b) for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [s[0] for s in stats],
                    "height": [s[1] for s in stats],
                    "channels": [s[2] for s in stats],
                    "sum_r": [s[3] for s in stats],
                    "sum_g": [s[4] for s in stats],
                    "sum_b": [s[5] for s in stats],
                    "top_row_sum": [s[6] for s in stats],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, schema)


def sample_frames(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    frame_bytes: int = 64,
    stride: int = 4,
    backend: str = "fake",
) -> DataFrame:
    """Frame sampling for container payloads (video/audio): one input
    row fans out to one output row per SAMPLED frame — the
    row-multiplying half of the multimodal family (``decode_features``
    is 1:1).

    ``backend="fake"``: the payload is treated as a flat concatenation
    of ``frame_bytes``-sized chunks and every ``stride``-th chunk is
    emitted with its frame index (the last chunk may be short). A real
    backend (ffmpeg keyframe demux) plugs in at the same seam with the
    same output contract: (id, frame_idx, frame).

    Scale shape: Arrow-batched ``mapInPandas``, output size ≈ input
    bytes / stride per partition — stride is the memory dial; the
    downstream per-frame ops (dedup by frame hash, feature extract)
    shuffle the SAMPLED set only, never the full container bytes.
    """
    if backend != "fake":
        raise NotImplementedError(
            f"frame-sample backend {backend!r}: no media codecs in this "
            "environment; only the deterministic 'fake' chunker is wired"
        )
    id_type = df.schema[id_col].dataType
    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("frame_idx", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    continue
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(bytes(b[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, bin_col).mapInPandas(gen, schema)


def resize_payloads(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    target_bytes: int = 32,
    backend: str = "fake",
) -> DataFrame:
    """Resize/downscale binary payloads 1:1 via Arrow-batched
    ``mapInPandas`` — the thumbnailing pass an image corpus runs
    before feature extraction (smaller bytes through every downstream
    shuffle).

    ``backend="fake"``: deterministic nearest-neighbor resampling —
    the payload is resampled to exactly ``target_bytes`` by picking
    evenly-spaced bytes (``(i·n) // target_bytes``; payloads shorter
    than the target repeat bytes, exactly like a nearest-neighbor
    upscale), a stand-in with the same contract as a real
    `PIL Image.resize`: output is a binary column of bounded size
    regardless of input size. NULL payloads pass through as
    ``resized=NULL`` / ``orig_bytes=NULL`` — the map is strictly 1:1,
    never row-dropping. Any other backend raises
    ``NotImplementedError`` at the codec seam.

    Scale shape: pure 1:1 Arrow-batched map, output partition size
    bounded by rows x target_bytes — the operator that turns a
    multi-TB raw-image scan into a bounded-width table.
    """
    if backend != "fake":
        raise NotImplementedError(
            f"resize backend {backend!r}: no image codecs in this "
            "environment; only the deterministic 'fake' resampler is wired"
        )
    id_type = df.schema[id_col].dataType
    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("orig_bytes", LongType()),
            StructField("resized", BinaryType()),
        ]
    )

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, origs, outs = [], [], []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    # 1:1 contract: NULL payload → NULL output row,
                    # never a dropped row (downstream joins on id_col
                    # must not lose cardinality)
                    ids.append(rid)
                    origs.append(None)
                    outs.append(None)
                    continue
                n = len(b)
                if n == 0:
                    out = bytes(target_bytes)
                else:
                    # evenly-spaced nearest-neighbor byte picks; the
                    # index (i·n)//target_bytes is provably < n, so
                    # short payloads repeat bytes (upscale), no pad
                    out = bytes(
                        b[(i * n) // target_bytes] for i in range(target_bytes)
                    )
                ids.append(rid)
                origs.append(n)
                outs.append(out)
            yield pd.DataFrame({id_col: ids, "orig_bytes": origs, "resized": outs})

    return df.select(id_col, bin_col).mapInPandas(resize, schema)
