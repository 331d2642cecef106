"""Multimodal columns: opaque binary media + typed metadata.

Media (image/audio/video) rides through the pipeline as an opaque
``binary`` column with a typed metadata struct — Spark never interprets
the bytes; decode/feature-extract runs in Arrow-batched ``mapInPandas``
so the JVM↔Python boundary is crossed once per batch, not per row.

The image/audio codec libraries are not available in this container, so
the decode step is STUBBED: ``decode_image`` raises
``NotImplementedError`` unless PIL is importable, and
``extract_media_features`` falls back to a deterministic fake feature
(derived from the md5 of the bytes) with the REAL Spark-side plumbing —
schema, batch shape, binary Arrow transfer — exercised end to end and
oracle-checked. Swapping in a real decoder changes only the inner
per-batch function.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # decode path gated behind an import-try (not in this container)
    from PIL import Image  # noqa: F401
    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])),
])

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_hex", T.StringType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table from the documents table:
    content = md5 digest bytes of the doc id (16 opaque bytes standing in
    for encoded media), metadata filled from doc fields. Pure column
    expressions — at real scale this stage is the Iceberg media scan."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.lit("https://media.example/img/"),
                 F.col("doc_id").cast("string"), F.lit(".jpg"))
         .alias("media_ref"),
        F.unhex(F.md5(F.col("doc_id").cast("string"))).alias("content"),
        F.struct(F.lit("jpeg").alias("format"),
                 (F.col("n_chars") % 1024).cast("int").alias("width"),
                 (F.col("n_chars") % 768).cast("int").alias("height"))
         .alias("meta"),
    )


def decode_image(content: bytes):
    """Decode encoded image bytes. STUB: requires PIL, absent here."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL — not available in this container; "
            "extract_media_features uses the deterministic fallback")
    import io
    return Image.open(io.BytesIO(content))


def _feature_from_bytes(content: bytes) -> list[float]:
    """Deterministic fake feature: first FEATURE_DIM bytes of
    md5(hex(content)) scaled to [0,1] — hex-string based so it is
    reproducible in SQL oracles (md5-over-blob isn't portable)."""
    import hashlib
    d = hashlib.md5(content.hex().encode()).digest()
    return [d[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_media_features(media: DataFrame,
                           batch_size_hint: int = 1024) -> DataFrame:
    """binary content → (n_bytes, content_hex, feature[FEATURE_DIM]).

    Arrow-batched mapInPandas: one Python invocation per batch; the
    binary column arrives as a pandas Series of bytes objects. The
    decode step would slot in per element here (vectorized libs like
    pillow-simd / torchvision batch decode when available)."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            contents = pdf["content"]
            feats, hexes, sizes = [], [], []
            for c in contents:
                b = bytes(c)
                sizes.append(len(b))
                hexes.append(b.hex())
                if _HAS_PIL:  # real decode path (unreachable here)
                    img = decode_image(b)  # pragma: no cover
                    feats.append(_feature_from_bytes(img.tobytes()))
                else:
                    feats.append(_feature_from_bytes(b))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "content_hex": hexes,
                "feature": feats,
            })

    return (media.select("doc_id", "media_ref", "content")
            .mapInPandas(extract, FEATURE_SCHEMA))


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("content_hex", T.StringType()),
])


def resize_media(media: DataFrame, width: int = 224,
                 height: int = 224) -> DataFrame:
    """Resize the media payload to (width, height) — the standard
    vision-model preprocessing stage. Real path: PIL decode → resize →
    re-encode per element inside the Arrow batch (absent here). Fake
    path: output bytes = md5 digest of (content_hex | WxH) — a pure
    content function with the same schema/batch shape, reproducible in
    the SQL oracle, so the distributed plumbing is exercised end to
    end and a real codec swaps in by replacing one inner function."""

    def resize(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd
        for pdf in batches:
            out_hex = []
            for c in pdf["content"]:
                b = bytes(c)
                if _HAS_PIL:  # pragma: no cover - real decode+resize
                    img = decode_image(b).resize((width, height))
                    out_hex.append(img.tobytes().hex())
                else:
                    out_hex.append(hashlib.md5(
                        f"{b.hex()}|{width}x{height}".encode()).hexdigest())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
                "content_hex": out_hex,
            })

    return (media.select("doc_id", "media_ref", "content")
            .mapInPandas(resize, RESIZE_SCHEMA))


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_sig", T.StringType()),
])


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Uniform frame sampling from a video payload: ``n_frames`` rows
    per media item. Real path: a container demuxer seeks to frame
    i/n_frames and decodes (no codec libs here). Fake path: frame_sig =
    md5(content_hex | 'frame' | i) — deterministic per (content, index),
    SQL-reproducible. One input row fans out to n_frames output rows
    inside the Arrow batch, the exact shape a real sampler produces."""
    if n_frames < 1:
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")

    def sample(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd
        for pdf in batches:
            ids, refs, idxs, sigs = [], [], [], []
            for doc_id, ref, c in zip(pdf["doc_id"], pdf["media_ref"],
                                      pdf["content"]):
                hx = bytes(c).hex()
                for i in range(n_frames):
                    ids.append(doc_id)
                    refs.append(ref)
                    idxs.append(i)
                    sigs.append(hashlib.md5(
                        f"{hx}|frame|{i}".encode()).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "media_ref": refs,
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_sig": sigs,
            })

    return (media.select("doc_id", "media_ref", "content")
            .mapInPandas(sample, FRAME_SCHEMA))
