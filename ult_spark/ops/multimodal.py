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


def extract_features(assets: DataFrame, dim: int = 4) -> DataFrame:
    """Deterministic fake feature extraction over Arrow batches.

    mapInPandas: iterates pandas batches, reads the binary payload, emits a
    fixed-dim integer feature vector derived from md5 — a stand-in with the
    exact batch shape / schema / partitioning a real encoder UDF would have.
    Self-contained closure (no package imports inside).
    """
    n_dim = int(dim)

    def feats(batches):
        import hashlib

        import pandas as _pd

        for pdf in batches:
            base = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            out = _pd.DataFrame({"asset_id": pdf["asset_id"], "kind": pdf["kind"]})
            for j in range(n_dim):
                out[f"f{j}"] = base.map(
                    lambda h, j=j: int(hashlib.md5(f"{j}:{h}".encode()).hexdigest()[:8], 16)
                )
            yield out

    schema = "asset_id long, kind string, " + ", ".join(f"f{j} long" for j in range(n_dim))
    return assets.mapInPandas(feats, schema)


def features_sql(dim: int = 4) -> str:
    # DuckDB 1.0 md5 accepts VARCHAR only; the payload IS the utf-8 text
    # bytes, so md5(text) equals Spark-side md5(binary payload)
    cols = ", ".join(
        f"('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' || md5(text)), 1, 8))::BIGINT AS f{j}"
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
