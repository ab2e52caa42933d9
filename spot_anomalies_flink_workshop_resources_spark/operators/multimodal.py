"""Multimodal (image/audio/video) column plumbing.

Training-data pipelines carry media as opaque ``binary`` columns with
typed metadata. The Spark-side plumbing here is real and tested —
schema, magic-byte sniffing in JVM expressions, Arrow-batched
``mapInPandas`` feature extraction with correct batch shapes and
partition-preserving plans. The actual codec work (PIL/librosa/ffmpeg)
is NOT in this container, so decode is stubbed: ``decode_image`` raises
NotImplementedError unless a decoder import succeeds, and
``fake_feature_extractor`` supplies a deterministic md5-based stand-in
so everything downstream (schemas, batching, joins on features) is
exercised for real.

Schema: (media_id long, media_type string, content binary,
         meta struct<width int, height int, duration_ms long>)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

# magic bytes -> sniffed container type (JVM-side, no UDF)
_MAGIC = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "52494646": "audio/wav",  # RIFF
    "00000018": "video/mp4",  # ftyp boxes (size 0x18)
    "00000020": "video/mp4",
}


def sniff_media_type(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Magic-byte container sniffing as a pure column expression."""
    head = F.upper(F.hex(F.expr(f"substring({content_col}, 1, 4)")))
    expr = F.lit("application/octet-stream")
    for magic, mtype in sorted(_MAGIC.items(), key=lambda kv: -len(kv[0])):
        expr = F.when(head.startswith(magic), F.lit(mtype)).otherwise(expr)
    return df.withColumn("sniffed_type", expr)


def media_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Opaque-content accounting: byte size + content digest (JVM-side)."""
    return df.withColumn("n_bytes", F.length(F.col(content_col)).cast("long")) \
             .withColumn("content_md5", F.md5(F.col(content_col)))


def decode_image(content: bytes):  # pragma: no cover - needs codec lib
    """Real decode path, gated on an optional dependency."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io

        return Image.open(io.BytesIO(content))
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL, not present in this environment; "
            "use fake_feature_extractor for pipeline testing"
        ) from e


def fake_feature_extractor(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decode→embed step: md5-seeded floats.
    STUB for the codec stage only — everything around it is real."""
    import hashlib

    out: list[float] = []
    h = content or b""
    counter = 0
    while len(out) < dim:
        d = hashlib.md5(h + counter.to_bytes(4, "big")).digest()
        for i in range(0, len(d), 4):
            out.append(int.from_bytes(d[i : i + 4], "big") / 2**32)
            if len(out) == dim:
                break
        counter += 1
    return out


def extract_features(
    df: DataFrame, content_col: str = "content", dim: int = FEATURE_DIM
) -> DataFrame:
    """Arrow-batched feature extraction over binary content (mapInPandas:
    the decode stage runs once per Arrow batch, never per-row-Python-UDF).
    Output keeps all input columns plus ``features array<double>``."""
    fields = df.schema.fields + [
        StructField("features", ArrayType(DoubleType()))
    ]
    out_schema = StructType(fields)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [
                fake_feature_extractor(c, dim) for c in pdf[content_col]
            ]
            yield pdf

    return df.mapInPandas(extract, out_schema)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, duration_col: str = "meta.duration_ms"
) -> DataFrame:
    """Video frame-sampling plumbing: explode one row per sampled frame
    timestamp (the decode of each frame is the stubbed stage). Pure
    column math, scales with total frames not videos."""
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col).cast("long") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )


def byte_shingle_pairs(
    media: DataFrame,
    threshold: float = 0.5,
    window_bytes: int = 8,
    stride_bytes: int = 4,
    df_cap: int | None = 64,
) -> DataFrame:
    """Binary near-duplicate pairs: Jaccard over strided byte-window
    shingles — the media twin of text n-gram dedup. Catches re-encoded
    uploads, header-patched copies, and containers wrapping the same
    payload, which digest-exact dedup (content_hash) misses entirely.

    Shingling happens in HEX SPACE (the cross-engine recipe for binary
    surgery — DuckDB has no substr on BLOB): each shingle is the
    ``window_bytes``-byte window at every ``stride_bytes`` offset,
    distinct per media. The stride keeps shingle volume at
    len/stride rather than len, and because it divides the 4-byte
    container magic, payload windows stay byte-aligned across
    different containers. Candidates come from the inverted-index
    self-join; ``df_cap`` prunes hot windows before counts AND the
    intersection symmetrically (the jaccard_pairs contract — one hot
    window of df d is d^2 candidate pairs).

    Output: (media_a, media_b, jaccard) for capped-set Jaccard >=
    threshold.
    """
    from ..catalog import spread

    w2, s2 = 2 * window_bytes, 2 * stride_bytes
    hx = spread(media).select("media_id", F.hex("content").alias("h"))
    arr = F.expr(
        f"transform(sequence(1, (length(h) - {w2}) div {s2} + 1), "
        f"i -> substring(h, (i - 1) * {s2} + 1, {w2}))"
    )
    toks = (
        hx.where(F.length("h") >= w2)
        .select("media_id", F.explode(F.array_distinct(arr)).alias("tok"))
        .localCheckpoint(eager=True)
    )
    if df_cap is not None:
        freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        # materialize the capped frame once: counts + both self-join
        # sides consume it, and without a checkpoint each recomputes
        # the df-cap join against the token frame
        toks = (
            toks.join(freq.where(F.col("df") <= df_cap), "tok")
            .select("media_id", "tok")
            .localCheckpoint(eager=True)
        )
    counts = toks.groupBy("media_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = toks.alias("a"), toks.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ca = counts.select(F.col("media_id").alias("media_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("media_id").alias("media_b"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(ca, "media_a")
        .join(cb, "media_b")
        .select("media_a", "media_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def byte_shingle_pairs_sql(
    media_cte: str,
    threshold: float = 0.5,
    window_bytes: int = 8,
    stride_bytes: int = 4,
    df_cap: int | None = 64,
) -> str:
    """DuckDB oracle twin of :func:`byte_shingle_pairs`; ``media_cte``
    supplies the (media_id, content) derivation."""
    w2, s2 = 2 * window_bytes, 2 * stride_bytes
    capped = (
        f""",
capped AS (
  SELECT t.media_id, t.tok FROM toks t
  JOIN (SELECT tok FROM toks GROUP BY tok HAVING COUNT(*) <= {df_cap}) f
    ON t.tok = f.tok
)"""
        if df_cap is not None
        else ""
    )
    src = "capped" if df_cap is not None else "toks"
    return f"""
WITH media AS ({media_cte}),
hx AS (SELECT media_id, hex(content) AS h FROM media),
toks AS MATERIALIZED (
  SELECT DISTINCT media_id, substr(h, (i - 1) * {s2} + 1, {w2}) AS tok
  FROM hx, UNNEST(generate_series(1, (length(h) - {w2}) // {s2} + 1)) AS t(i)
  WHERE length(h) >= {w2}
){capped},
counts AS (SELECT media_id, COUNT(*) AS n FROM {src} GROUP BY media_id),
common AS (
  SELECT a.media_id AS media_a, b.media_id AS media_b, COUNT(*) AS c
  FROM {src} a JOIN {src} b ON a.tok = b.tok AND a.media_id < b.media_id
  GROUP BY 1, 2
)
SELECT media_a, media_b,
       CAST(c AS DOUBLE) / (ca.n + cb.n - c) AS jaccard
FROM common
JOIN counts ca ON ca.media_id = media_a
JOIN counts cb ON cb.media_id = media_b
WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= {threshold}
"""
