"""Multimodal asset operators (task brief: image/audio/video as opaque
binary columns with typed metadata).

The decode/resize/frame-extract steps require media libraries that are NOT
in this container (PIL / torchaudio / ffmpeg) — they are import-gated and
raise ``NotImplementedError`` with a clear message, per the brief. The
Spark-side plumbing is REAL and tested: schemas, partitioning, mapInPandas
batch iteration, Arrow binary transfer, deterministic fake feature
extraction (md5-derived — exactly reproducible in the DuckDB oracle).

At scale: payloads stay opaque binary through pruned scans; feature
extraction is an embarrassingly-parallel mapInPandas over batches; metadata
predicates push down to parquet so "images wider than X" never reads the
payload bytes of non-matching rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, duration_ms int"
)

KINDS = ("image", "audio", "video")


def synth_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic assets table derived from `documents` (payload = the
    utf-8 text bytes standing in for media bytes; metadata = integer
    functions of doc_id/n_chars — reproducible in SQL for the oracle)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        ((F.col("n_chars") % 640) + 16).cast("int").alias("width"),
        ((F.col("n_chars") % 480) + 16).cast("int").alias("height"),
        (F.when(F.col("doc_id") % 2 == 0, 44100).otherwise(16000)).cast("int").alias("sample_rate"),
        ((F.col("n_chars") * 37 % 600000) + 1000).cast("int").alias("duration_ms"),
    )


ASSETS_SQL = (
    "SELECT doc_id AS asset_id, (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS kind, "
    "encode(text) AS payload, CAST(n_chars % 640 + 16 AS INT) AS width, "
    "CAST(n_chars % 480 + 16 AS INT) AS height, "
    "CAST(CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 16000 END AS INT) AS sample_rate, "
    "CAST((n_chars * 37) % 600000 + 1000 AS INT) AS duration_ms FROM documents"
)


def decode_image(payload_bytes: bytes):  # pragma: no cover - stub
    """Real image decode — requires PIL, absent in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL, which is not available in this "
            "environment; the pipeline plumbing around it is real — swap "
            "this stub for PIL.Image.open when the library is present"
        ) from e
    raise NotImplementedError("unreachable in this sandbox")


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:  # pragma: no cover
    """Stub: raises until a decode library exists (import-gated)."""
    decode_image(b"")
    return assets


FEATURES_VERSION = 2  # v1 hashed per row inside the kernel (round-2 verdict
# #6); v2 hoists ONE native md5 to the JVM and derives each dim from a hex
# slice of that digest, so the Python kernel is pure vectorized numpy


def extract_features(assets: DataFrame, dim: int = 4) -> DataFrame:
    """Deterministic fake feature extraction over Arrow batches (feature id
    v2 — :data:`FEATURES_VERSION`).

    Two stages, shaped like a real encoder pipeline:

    1. digest: ``md5(payload)`` as a NATIVE JVM expression (whole-stage
       codegen — the expensive byte crunch never enters Python);
    2. encode: mapInPandas kernel with the batch shape / schema /
       partitioning a real batched encoder UDF would have, but the body is
       pure VECTORIZED numpy — hex nibbles → per-dim integers via matrix
       arithmetic, zero per-row Python (round-2 verdict #6: v1 called
       hashlib once per row per dim inside ``Series.map``).

    dim ≤ 4: each feature consumes 8 of the 32 hex chars of one md5.
    Self-contained closure (numpy/pandas only, no package imports).
    """
    n_dim = int(dim)
    if not 1 <= n_dim <= 4:
        raise ValueError("dim must be in [1, 4] — 4 × 8 hex chars per md5")

    def feats(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = _pd.DataFrame({"asset_id": pdf["asset_id"], "kind": pdf["kind"]})
            # (n, 32) uint8 matrix of hex chars → nibble values, vectorized
            hx = _np.asarray(pdf["_h"], dtype="S32").view(_np.uint8).reshape(-1, 32)
            nib = _np.where(hx >= ord("a"), hx - ord("a") + 10, hx - ord("0"))
            nib = nib.astype(_np.int64)
            pw = _np.int64(16) ** _np.arange(7, -1, -1, dtype=_np.int64)
            for j in range(n_dim):
                out[f"f{j}"] = nib[:, 8 * j : 8 * j + 8] @ pw
            yield out

    schema = "asset_id long, kind string, " + ", ".join(f"f{j} long" for j in range(n_dim))
    return assets.withColumn("_h", F.md5("payload")).mapInPandas(feats, schema)


def features_sql(dim: int = 4) -> str:
    # DuckDB 1.0 md5 accepts VARCHAR only; the payload IS the utf-8 text
    # bytes, so md5(text) equals Spark-side md5(binary payload). Feature id
    # v2: dim j = hex slice [8j, 8j+8) of the single digest.
    cols = ", ".join(
        f"('0x' || substr(md5(text), {8 * j + 1}, 8))::BIGINT AS f{j}"
        for j in range(dim)
    )
    return (
        f"SELECT doc_id AS asset_id, "
        f"(['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS kind, {cols} "
        f"FROM documents"
    )


def frame_sample(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: metadata-only (no decode) — one row per
    sampled frame offset; the decode of each frame is the import-gated stub."""
    vids = assets.where(F.col("kind") == "video")
    offs = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
    return vids.select("asset_id", F.explode(offs).alias("frame_ms"))


def audio_chunks(assets: DataFrame, win_ms: int = 2000, hop_ms: int = 1000) -> DataFrame:
    """Audio chunking plan (r4 — the audio twin of :func:`frame_sample`):
    metadata-only overlapping windows of ``win_ms`` every ``hop_ms``, one
    row per chunk with its exact sample count from the asset's rate. The
    decode of each chunk stays behind the import-gated stub; the plan is
    the Spark-side work a real torchaudio pipeline would fan out.

    Exactness note: n_samples = (ms·rate − (ms·rate) % 1000) / 1000 — the
    dividend is forced to a multiple of 1000 first, so the double division
    is exact and both engines CAST the identical integer."""
    aud = assets.where(F.col("kind") == "audio")
    starts = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(hop_ms))
    df = aud.select(
        "asset_id", "sample_rate", "duration_ms", F.explode(starts).alias("start_ms")
    )
    end = F.least(F.col("start_ms") + F.lit(win_ms), F.col("duration_ms"))
    raw = (end - F.col("start_ms")) * F.col("sample_rate")
    return df.select(
        "asset_id",
        F.col("start_ms").cast("long").alias("start_ms"),
        end.cast("long").alias("end_ms"),
        ((raw - raw % 1000) / 1000).cast("long").alias("n_samples"),
    )


def audio_chunks_sql(win_ms: int = 2000, hop_ms: int = 1000) -> str:
    return (
        f"WITH a AS ({ASSETS_SQL}), "
        "c AS (SELECT asset_id, sample_rate, duration_ms, "
        f"unnest(generate_series(0, duration_ms - 1, {hop_ms})) AS start_ms "
        "FROM a WHERE kind = 'audio') "
        f"SELECT asset_id, start_ms, least(start_ms + {win_ms}, duration_ms) AS end_ms, "
        f"CAST(((least(start_ms + {win_ms}, duration_ms) - start_ms) * sample_rate "
        f"- ((least(start_ms + {win_ms}, duration_ms) - start_ms) * sample_rate) % 1000) / 1000 AS BIGINT) "
        "AS n_samples FROM c"
    )
