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

This container has no image/audio codecs, so the decode *backend* is
stubbed: ``backend="fake"`` produces deterministic features (real
Spark plumbing — schema, Arrow batching, UDF signature — exercised by
tests); any other backend raises ``NotImplementedError`` at the seam
where PIL/torchvision/ffmpeg would slot in.
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
