"""Multimodal-column queries over a deterministic synthetic media table.

The driver testdata has no media table, so one is DERIVED deterministically
from ``documents`` (no external data, per the task brief): each doc becomes
one media row with a kind (image/audio/video), typed metadata, and a
128-byte opaque ``binary`` payload built from chained md5 of the text.
Both engines can build the identical payload — Spark as real ``binary``
(``to_binary(.., 'hex')``), DuckDB as the equivalent hex VARCHAR (DuckDB
BLOBs can be built but not sliced/hashed, so its side of every oracle
works on the hex string; ``hex(substring(bin, o+1, n)) ==
substring(hexstr, 2o+1, 2n)`` makes the two representations comparable
byte-for-byte).

That gives the multimodal family END-TO-END value-hash checks against an
independent engine — including through the ``mapInPandas`` fake decoder
and the Arrow pandas-UDF resizer (operators/media.py), whose byte-level
outputs DuckDB recomputes arithmetically from the hex string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgpipe.queries.registry import load, register
from kgpipe.queries.textops import portable_hash_spark, portable_hash_sql

_N_CHUNKS = 8  # payload = 8 chained md5 blocks = 128 bytes
_PAYLOAD_BYTES = 16 * _N_CHUNKS
RESIZE_W, RESIZE_H = 8, 8


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, kind, width, height, sample_rate, n_frames,
    payload:binary) — deterministic per doc."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    h = portable_hash_spark(F.col("text"))
    hexp = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(_N_CHUNKS - 1)),
            lambda i: F.md5(F.concat(F.col("text"), F.lit("_p"),
                                     i.cast("string"))),
        ),
        "",
    )
    return (
        d.withColumn("h", h)
        .select(
            F.col("doc_id").alias("media_id"),
            F.expr("CASE h % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
                   "ELSE 'video' END").alias("kind"),
            F.expr("CASE WHEN h % 3 != 1 THEN CAST(16 + (h % 16) * 8 AS INT) "
                   "ELSE 0 END").alias("width"),
            F.expr("CASE WHEN h % 3 != 1 THEN "
                   "CAST(16 + ((h div 16) % 16) * 8 AS INT) ELSE 0 END"
                   ).alias("height"),
            F.expr("CASE WHEN h % 3 = 1 THEN "
                   "CAST(8000 + (h % 5) * 4000 AS INT) ELSE 0 END"
                   ).alias("sample_rate"),
            F.expr("CASE WHEN h % 3 = 2 THEN CAST(4 + h % 5 AS INT) "
                   "ELSE 1 END").alias("n_frames"),
            F.to_binary(hexp, F.lit("hex")).alias("payload"),
        )
    )


# the identical derivation as a DuckDB CTE (hex-string payload)
_MEDIA_SQL = f"""
    media AS (
      SELECT doc_id AS media_id,
             CASE h % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             CASE WHEN h % 3 != 1 THEN CAST(16 + (h % 16) * 8 AS INT)
                  ELSE 0 END AS width,
             CASE WHEN h % 3 != 1 THEN
                  CAST(16 + ((h // 16) % 16) * 8 AS INT)
                  ELSE 0 END AS height,
             CASE WHEN h % 3 = 1 THEN CAST(8000 + (h % 5) * 4000 AS INT)
                  ELSE 0 END AS sample_rate,
             CASE WHEN h % 3 = 2 THEN CAST(4 + h % 5 AS INT)
                  ELSE 1 END AS n_frames,
             hexp
      FROM (
        SELECT doc_id, {portable_hash_sql("text")} AS h,
               list_aggregate(list_transform(range(0, {_N_CHUNKS}),
                   i -> md5(text || '_p' || i)), 'string_agg', '') AS hexp
        FROM documents)
    )
"""


@register(
    "media_meta_stats",
    oracle=f"""
    WITH {_MEDIA_SQL}
    SELECT kind, count(*) AS n,
           round(avg(width), 4) AS avg_width,
           round(avg(height), 4) AS avg_height,
           round(avg(sample_rate), 4) AS avg_sample_rate,
           round(avg(n_frames), 4) AS avg_n_frames,
           CAST(sum(length(hexp) // 2) AS BIGINT) AS total_bytes
    FROM media GROUP BY kind
    """,
)
def media_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata profile of the media table; ``total_bytes`` reads the
    real binary column's length."""
    m = media_table(spark, sf_dir)
    return m.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("width"), 4).alias("avg_width"),
        F.round(F.avg("height"), 4).alias("avg_height"),
        F.round(F.avg("sample_rate"), 4).alias("avg_sample_rate"),
        F.round(F.avg("n_frames"), 4).alias("avg_n_frames"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
    )


@register(
    "media_frame_hashes",
    oracle=f"""
    WITH {_MEDIA_SQL},
    v AS (
      SELECT media_id, n_frames,
             CAST((length(hexp) // 2) // n_frames AS INT) AS frame_len, hexp
      FROM media WHERE kind = 'video'
    ),
    frames AS (
      SELECT media_id, unnest(range(0, n_frames)) AS frame_idx,
             frame_len, hexp
      FROM v
    )
    SELECT media_id, CAST(frame_idx AS INT) AS frame_idx, frame_len,
           md5(substring(hexp, CAST(frame_idx AS INT) * frame_len * 2 + 1,
               frame_len * 2)) AS frame_md5
    FROM frames WHERE frame_idx % 2 = 0
    """,
)
def media_frame_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling through the JVM binary-substring operator
    (operators/media.py::sample_frames — zero Python), hashed for the
    cross-engine check: Spark hashes the hex of the genuine BINARY slice,
    DuckDB hashes the equivalent hex substring."""
    from kgpipe.operators.media import sample_frames

    f = sample_frames(media_table(spark, sf_dir), every_k=2)
    return f.select(
        "media_id", "frame_idx", "frame_len",
        F.md5(F.lower(F.hex("frame"))).alias("frame_md5"),
    )


@register(
    "media_decode_features",
    oracle=f"""
    WITH {_MEDIA_SQL}
    SELECT media_id, kind,
           CAST(length(hexp) // 2 AS INT) AS n_bytes,
           round(list_avg(list_transform(range(0, length(hexp) // 2),
                 i -> CAST('0x' || substring(hexp, i * 2 + 1, 2) AS INT))),
                 6) AS mean_byte
    FROM media
    """,
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas fake-decoder's byte statistics, value-hash-checked
    against DuckDB recomputing them arithmetically from the hex payload —
    an end-to-end oracle THROUGH the Arrow decode surface."""
    from kgpipe.operators.media import decode_media_features

    feats = decode_media_features(media_table(spark, sf_dir))
    return feats.select(
        "media_id", "kind", "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
    )


@register(
    "media_resize_images",
    oracle=f"""
    WITH {_MEDIA_SQL}
    SELECT media_id,
           list_aggregate(list_transform(range(0, {RESIZE_W * RESIZE_H}),
               j -> substring(hexp,
                    CAST((j * (length(hexp) // 2)) // {RESIZE_W * RESIZE_H}
                         AS INT) * 2 + 1, 2)),
               'string_agg', '') AS resized_hex
    FROM media WHERE kind = 'image'
    """,
)
def media_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow pandas-UDF resizer (nearest-neighbor fake backend) vs
    DuckDB's arithmetic index map — byte-for-byte equality of the resized
    binary, compared in hex."""
    from kgpipe.operators.media import resize_images

    r = resize_images(media_table(spark, sf_dir), RESIZE_W, RESIZE_H)
    return r.select(
        "media_id", F.lower(F.hex("resized")).alias("resized_hex"))
