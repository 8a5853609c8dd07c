"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct alongside. The Spark-side contract — schema, Arrow
batching via mapInPandas, partition sizing — is real and tested; the
actual codec work is stubbed because no image/audio libraries exist in
this container (decode_image_batch raises NotImplementedError unless the
deterministic fake decoder is requested).

Scale notes: binary payloads dominate partition size, so the loader
should target spark.sql.files.maxPartitionBytes well below executor
memory and NEVER collect payloads to the driver; mapInPandas streams
Arrow record batches, so peak memory is one batch, not one partition
(tune spark.sql.execution.arrow.maxRecordsPerBatch for multi-MB blobs).
Feature extraction emits small fixed-width outputs, so the post-decode
stage re-coalesces to fewer partitions.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = "byte_len BIGINT, width INT, height INT, format STRING"


def attach_binary_payload(df: DataFrame, text_col: str = "text", out: str = "payload") -> DataFrame:
    """Testdata shim: treat utf-8 bytes of a text column as the opaque
    media payload (the container has no real media files)."""
    return df.withColumn(out, F.encode(F.col(text_col), "utf-8"))


def fake_decode_meta(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for an image decode: derives fake
    dimensions from content bytes. Replaces e.g. PIL.Image.open in the
    real deployment; signature and output schema are the real contract."""
    import hashlib

    h = hashlib.md5(payload).digest()
    return {
        "byte_len": len(payload),
        "width": 64 + (h[0] << 8 | h[1]) % 1984,
        "height": 64 + (h[2] << 8 | h[3]) % 1984,
        "format": "fake/raw",
    }


def decode_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: str = "fake",
) -> DataFrame:
    """mapInPandas decode stage: (id, payload) → (id, meta struct fields).

    decoder="real" is the production hook point — it raises until a codec
    library is wired in; "fake" is the deterministic test double.
    """
    if decoder == "real":
        raise NotImplementedError(
            "no media codec libraries in this environment; use decoder='fake' "
            "or wire PIL/ffmpeg here in a real deployment"
        )

    out_schema = f"{id_col} BIGINT, {MEDIA_META_DDL}"

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            metas = [fake_decode_meta(p) for p in pdf[payload_col]]
            out = pdf[[id_col]].copy()
            out["byte_len"] = [m["byte_len"] for m in metas]
            out["width"] = [m["width"] for m in metas]
            out["height"] = [m["height"] for m in metas]
            out["format"] = [m["format"] for m in metas]
            yield out

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def extract_media_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_features: int = 4,
) -> DataFrame:
    """Feature-extraction stage: binary payload → fixed-width numeric
    feature columns via Arrow-batched mapInPandas (the embed-images /
    fingerprint-audio shape). The deterministic stand-in derives
    features from the md5 digest; a real model inference call drops
    into the same batch loop with identical schema/partitioning."""
    import hashlib

    names = [f"f{i}" for i in range(n_features)]
    out_schema = f"{id_col} BIGINT, " + ", ".join(f"{n} INT" for n in names)

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            feats = []
            for p in pdf[payload_col]:
                d = hashlib.md5(p).digest()
                feats.append([d[i] for i in range(n_features)])
            out = pdf[[id_col]].copy()
            for i, n in enumerate(names):
                out[n] = [f[i] for f in feats]
            yield out

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 32,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled "frame"
    (byte offset stands in for a video frame index). Pure expressions —
    posexplode over a computed offset sequence — to show the fan-out
    shape; the real frame decode plugs into decode_media_meta above."""
    n = F.floor(F.octet_length(payload_col) / every_n_bytes).cast("int")
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    return df.select(
        id_col,
        F.octet_length(payload_col).alias("byte_len"),
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    ).select(
        id_col, "byte_len", "frame_idx", (F.col("byte_offset") * every_n_bytes).alias("byte_offset")
    )
