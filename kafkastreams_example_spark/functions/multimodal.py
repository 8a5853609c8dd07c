"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct alongside. The Spark-side contract — schema, Arrow
batching via mapInPandas, partition sizing — is real and tested, and so
is metadata decode: parse_image_header reads PNG/GIF/BMP/JPEG dimensions
straight from container header bytes with pure-Python struct reads (no
codec library needed). Only pixel-level work (decoding image content for
feature extraction) remains a documented library hook, since no
image/audio libraries exist in this container; the deterministic fake
decoder carries that contract in tests.

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


def parse_image_header(payload: bytes) -> dict[str, Any] | None:
    """Real image-dimension decode from container header bytes — pure
    Python struct reads, no codec library. Handles PNG (IHDR, big-endian
    u32 pair), GIF87a/89a (logical screen, little-endian u16 pair), BMP
    (BITMAPINFOHEADER, signed little-endian; height may be negative for
    top-down rows), and JPEG (marker walk to the first SOFn frame
    header, skipping entropy-free segments). Returns None when the
    payload is not a recognized image container — the caller decides
    the unknown-format policy. Only header bytes are touched, so cost
    is O(segments), not O(pixels)."""
    import struct

    n = len(payload)
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return {"width": w, "height": h, "format": "png"}
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return {"width": w, "height": h, "format": "gif"}
    if n >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack("<ii", payload[18:26])
        return {"width": w, "height": abs(h), "format": "bmp"}
    if n >= 4 and payload[:2] == b"\xff\xd8":  # JPEG SOI, walk the markers
        i = 2
        while i + 4 <= n:
            if payload[i] != 0xFF:  # stray fill byte — resync
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:  # padding before a marker
                i += 1
                continue
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:  # standalone
                i += 2
                continue
            seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            # SOFn carry dimensions; C4/C8/CC are DHT/JPG/DAC, not frames
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= n:
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return {"width": w, "height": h, "format": "jpeg"}
                return None
            i += 2 + seglen
    return None


def parse_audio_header(payload: bytes) -> dict[str, Any] | None:
    """Real audio-metadata decode from container header bytes — pure
    Python struct reads, no codec library (sibling of
    parse_image_header). Full parse for WAV (RIFF chunk walk to fmt +
    data: sample rate, channels, bit depth, duration from
    data_size/byte_rate) and FLAC (STREAMINFO bit-packed fields);
    container recognition (format only) for Ogg and MP3 (ID3v2 or a
    bare MPEG frame sync), whose per-frame rate tables are a codec
    concern, not a header read. Returns None for unrecognized payloads.
    Only header bytes are touched — O(chunks), never O(samples)."""
    import struct

    n = len(payload)
    if n >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        sample_rate = channels = bits = byte_rate = data_size = None
        i = 12
        while i + 8 <= n:  # RIFF chunk walk: id u32le-size payload
            cid = payload[i : i + 4]
            (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
            if cid == b"fmt " and i + 24 <= n:
                channels, sample_rate = struct.unpack("<HI", payload[i + 10 : i + 16])
                (byte_rate,) = struct.unpack("<I", payload[i + 16 : i + 20])
                if i + 24 <= n:
                    (bits,) = struct.unpack("<H", payload[i + 22 : i + 24])
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if sample_rate is None:
            return None
        # bounds guard: the fmt fields are unsigned on the wire but the
        # output schema is signed INT — a garbage header with e.g.
        # sample_rate 0xFFFFFFFF must degrade to 'unknown', not crash
        # the Arrow conversion of the whole batch
        if not (0 < sample_rate <= 2**31 - 1) or not (0 < (channels or 0) <= 2**15):
            return None
        duration_ms = (
            data_size * 1000 // byte_rate
            if data_size is not None and byte_rate
            else None
        )
        return {
            "sample_rate": sample_rate,
            "channels": channels,
            "bits": bits,
            "duration_ms": duration_ms,
            "format": "wav",
        }
    if n >= 26 and payload[:4] == b"fLaC":
        # metadata block header (4 bytes) then STREAMINFO: 2+2 block
        # sizes, 3+3 frame sizes, then at offset 18 the bit-packed
        # 20-bit sample rate, 3-bit channels-1, 5-bit bits-1
        b = payload
        sample_rate = (b[18] << 12) | (b[19] << 4) | (b[20] >> 4)
        channels = ((b[20] >> 1) & 0x7) + 1
        bits = (((b[20] & 0x1) << 4) | (b[21] >> 4)) + 1
        return {
            "sample_rate": sample_rate,
            "channels": channels,
            "bits": bits,
            "duration_ms": None,  # needs total_samples (36 bits) + div
            "format": "flac",
        }
    if n >= 4 and payload[:4] == b"OggS":
        return {
            "sample_rate": None,
            "channels": None,
            "bits": None,
            "duration_ms": None,
            "format": "ogg",
        }
    if n >= 3 and (
        payload[:3] == b"ID3"
        or (payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0)
    ):
        return {
            "sample_rate": None,
            "channels": None,
            "bits": None,
            "duration_ms": None,
            "format": "mp3",
        }
    return None


AUDIO_META_DDL = (
    "byte_len BIGINT, sample_rate INT, channels INT, bits INT, "
    "duration_ms BIGINT, format STRING"
)


def decode_audio_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas audio-metadata decode stage: (id, payload) →
    (id, byte_len, sample_rate, channels, bits, duration_ms, format).
    Same Arrow batch shape as decode_media_meta; unrecognized payloads
    degrade to NULL fields + 'unknown'."""
    out_schema = f"{id_col} BIGINT, {AUDIO_META_DDL}"
    fields = ("sample_rate", "channels", "bits", "duration_ms", "format")

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            metas = []
            for p in pdf[payload_col]:
                m = parse_audio_header(p)
                if m is None:
                    m = dict.fromkeys(fields)
                    m["format"] = "unknown"
                m["byte_len"] = len(p)
                metas.append(m)
            out = pdf[[id_col]].copy()
            out["byte_len"] = [m["byte_len"] for m in metas]
            for f in fields:
                out[f] = [m[f] for m in metas]
            yield out

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def decode_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: str = "fake",
) -> DataFrame:
    """mapInPandas decode stage: (id, payload) → (id, meta struct fields).

    decoder="real" parses actual PNG/GIF/BMP/JPEG container headers
    (parse_image_header — pure struct reads, no codec library);
    unrecognized payloads come back as (byte_len, NULL, NULL,
    'unknown'). decoder="fake" is the deterministic test double used by
    the oracle-gated queries, whose payloads are text bytes, not
    images. Pixel-level decode (not needed for metadata) remains the
    documented library hook in extract_media_features.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}: use 'fake' or 'real'")

    out_schema = f"{id_col} BIGINT, {MEDIA_META_DDL}"

    def decode_one(p: bytes) -> dict[str, Any]:
        if decoder == "fake":
            return fake_decode_meta(p)
        meta = parse_image_header(p)
        if meta is None:
            return {"byte_len": len(p), "width": None, "height": None, "format": "unknown"}
        return {"byte_len": len(p), **meta}

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            metas = [decode_one(p) for p in pdf[payload_col]]
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
