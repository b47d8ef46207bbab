"""Multimodal column plumbing: opaque binary payloads + typed metadata.

No image/audio libraries exist in this container (and the reference is
text-only), so the *decode kernels are stubbed* behind deterministic
fakes / ``NotImplementedError`` — but the Spark-side plumbing is real and
tested end-to-end: schema, Arrow batch shape, ``mapInPandas`` signatures,
and the partitioning story all match what a production decode stage needs.

Design for 100 TB of media:
- payloads are ``binary`` columns ride along in the same row as metadata —
  column pruning means metadata-only queries never read payload bytes
  (parquet reads only projected columns);
- decode/feature stages are ``mapInPandas`` (one Arrow batch per call, the
  batch size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so a batch of 10 MB images never OOMs a worker);
- frame sampling emits multiple rows per input (UDTF-style mapInPandas);
- real decoders (PIL/librosa/av) drop into ``_decode_image_batch`` etc.
  without touching any plumbing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "n_bytes int, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"

FRAME_SCHEMA = "media_id long, frame_idx int, frame_feature array<float>"

_FAKE_DIM = 16


def synth_media_df(spark, docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from a text table: payload =
    UTF-8 bytes of the text (a stand-in blob), metadata derived from
    lengths. Lets every downstream stage run for real on synthetic data."""
    kind = F.when(F.col(id_col) % 3 == 0, "image").when(
        F.col(id_col) % 3 == 1, "audio"
    ).otherwise("video")
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        # blob size recorded as METADATA at ingest: metadata-only
        # aggregates must never read payload bytes (media_metadata_stats)
        F.length(payload).cast("int").alias("n_bytes"),
        (F.length(text_col) % 1920).cast("int").alias("width"),
        (F.length(text_col) % 1080).cast("int").alias("height"),
        (F.length(text_col) * 10).cast("int").alias("duration_ms"),
    )


def _decode_image_batch(payloads: pd.Series) -> np.ndarray:
    """STUB — real impl: PIL.Image.open per payload, resize, to-array.
    Deterministic fake: feature j = byte-histogram moment of power
    ``1 + j%4`` of the payload, offset by j.

    Exactness contract: the moment sums run in int64 and there is exactly
    ONE float operation per feature (a float64 division, then the float32
    store). Any engine that can sum integers — the DuckDB twin in
    ``__spark_entry__.oracle_sql()['media_features']`` — reproduces the
    stored float32 bit-for-bit, which is what upgraded this entry from
    rows-only to value-hash. int64 headroom: byte^4 ≤ 255^4 ≈ 4.2e9, so
    payloads up to ~2e9 bytes fit before Σb^4 overflows."""
    out = np.zeros((len(payloads), _FAKE_DIM), dtype=np.float32)
    js = np.arange(_FAKE_DIM, dtype=np.float64)
    for i, buf in enumerate(payloads):
        arr = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.int64)
        n = len(arr)
        if n:
            s = np.array([int(np.sum(arr ** p)) for p in (1, 2, 3, 4)],
                         dtype=np.int64)
            den = np.array([n * 255 ** p for p in (1, 2, 3, 4)],
                           dtype=np.int64)
            vals = s.astype(np.float64) / den.astype(np.float64)
            out[i] = (js + vals[np.arange(_FAKE_DIM) % 4]).astype(np.float32)
    return out


def _decode_audio_batch(payloads: pd.Series) -> np.ndarray:
    """STUB — real impl: soundfile/librosa decode + mel features."""
    return _decode_image_batch(payloads) * np.float32(0.5)


def _decode_video_frames(payload: bytes, every_n: int) -> list[np.ndarray]:
    """STUB — real impl: av container demux, keyframe sample every_n.
    Fake: one 'frame' per 64-byte chunk of payload."""
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    chunks = [arr[i: i + 64] for i in range(0, len(arr), 64)][::every_n]
    return [
        np.resize(c.astype(np.float32) / 255.0, _FAKE_DIM) for c in chunks
    ]


def extract_features(media: DataFrame) -> DataFrame:
    """payload → fixed-dim feature vector, one Arrow batch at a time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.zeros((len(pdf), _FAKE_DIM), dtype=np.float32)
            for kind, decoder in (
                ("image", _decode_image_batch),
                ("audio", _decode_audio_batch),
            ):
                mask = (pdf["kind"] == kind).to_numpy()
                if mask.any():
                    feats[mask] = decoder(pdf["payload"][mask])
            vmask = (pdf["kind"] == "video").to_numpy()
            if vmask.any():
                # video feature = mean over sampled frames, computed in
                # the int64 domain (sum the cycled bytes, divide ONCE):
                # frame k's feature j is chunk_k[j % len(chunk_k)]/255
                # (np.resize cycling, _decode_video_frames), so the mean
                # is Σ_k chunk_k[j % L_k] / (255·K) — a single float64
                # division per feature, SQL-replayable like the
                # image/audio moments
                for i in np.flatnonzero(vmask):
                    buf = np.frombuffer(
                        bytes(pdf["payload"].iloc[i]), dtype=np.uint8
                    ).astype(np.int64)
                    n = len(buf)
                    if n == 0:
                        continue
                    offs = np.arange(0, n, 64)
                    chunk_len = np.minimum(64, n - offs)
                    j = np.arange(_FAKE_DIM)
                    idx = offs[:, None] + (j[None, :] % chunk_len[:, None])
                    m = buf[idx].sum(axis=0)
                    feats[i] = (
                        m.astype(np.float64) / float(255 * len(offs))
                    ).astype(np.float32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """UDTF-style expansion: one row per sampled frame (video rows only)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for _, row in pdf[pdf["kind"] == "video"].iterrows():
                for fi, f in enumerate(_decode_video_frames(row["payload"], every_n)):
                    ids.append(row["media_id"])
                    idxs.append(fi)
                    feats.append(f)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    # object dtype: an empty partition would otherwise
                    # produce a float64 column that Arrow can't cast to
                    # list<float>
                    "frame_feature": pd.Series(feats, dtype="object"),
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — projection reads the ``n_bytes``
    metadata column recorded at ingest and excludes ``payload``, so the
    parquet scan never touches the blob bytes (ReadSchema asserted in
    tests/test_plans.py)."""
    return (
        media.select("kind", "duration_ms", "n_bytes")
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
    )
