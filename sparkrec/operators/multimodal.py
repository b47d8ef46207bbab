"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode kernels (round 5): **real for BMP images and RIFF/WAV PCM audio**,
parsed in pure numpy — fixed headers + ``np.frombuffer`` need no external
library. ``_decode_image_batch`` / ``_decode_audio_batch`` sniff the
payload magic: ``BM`` → full BMP parse (header offsets, 24-bpp bottom-up
rows, 4-byte row padding, BGR→RGB), ``RIFF..WAVE`` → chunk-walking WAV
parse (skips unknown chunks, 16-bit PCM). Formats that DO need a library
(JPEG/PNG/MP3/MP4) fall back to the deterministic byte-moment fake, the
declared-stub pattern — but the kernels, schema, Arrow batch shape,
``mapInPandas`` signatures, and partitioning story are executed for real
end-to-end (tests/test_articles_multimodal.py goldens; the
``media_decode`` contract entry hash-matches a DuckDB twin that replays
the decoded pixel/sample moments, so a parser that mishandles padding,
row order, channel order, or chunk offsets fails the gate).

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

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, n_units int, "
    "feature array<float>"
)

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


# ---------------------------------------------------------------------------
# real pure-numpy codecs: BMP (24-bpp) and RIFF/WAV (16-bit PCM mono)
# ---------------------------------------------------------------------------

# BMP padding filler deliberately non-zero: a "decoder" that moments over
# raw payload bytes instead of parsing rows sees these and mismatches the
# oracle, so the contract hash proves the padding is actually stripped.
_BMP_PAD_BYTE = 0xAB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bpp bottom-up BMP bytes
    (BITMAPFILEHEADER + BITMAPINFOHEADER, rows padded to 4 bytes)."""
    import struct

    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.full((h, stride), _BMP_PAD_BYTE, dtype=np.uint8)
    # bottom-up row order, BGR channel order — the on-disk BMP layout
    rows[:, :row_bytes] = pixels[::-1, :, ::-1].reshape(h, row_bytes)
    return header + info + rows.tobytes()


def decode_bmp(buf: bytes) -> np.ndarray:
    """Real BMP parser → (H, W, 3) uint8 RGB. Handles the 24-bpp
    uncompressed bottom-up layout: reads the pixel-array offset from the
    file header (so gap bytes before the array are skipped), strips the
    4-byte row padding, flips rows top-down, swaps BGR→RGB."""
    import struct

    buf = bytes(buf)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", buf, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    (compression,) = struct.unpack_from("<I", buf, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    flip = h > 0            # positive height = bottom-up storage
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)
    if flip:
        px = px[::-1]
    return px[:, :, ::-1].copy()   # BGR → RGB


def encode_wav(samples: np.ndarray, rate: int = 16000,
               junk_chunk: bytes | None = None) -> bytes:
    """int16 mono PCM → RIFF/WAVE bytes. ``junk_chunk`` inserts an extra
    chunk BEFORE ``data`` (like real encoders' LIST/INFO metadata) so the
    decoder's chunk walk is exercised for real."""
    import struct

    assert samples.dtype == np.int16
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if junk_chunk is not None:
        padded = junk_chunk + (b"\x00" if len(junk_chunk) % 2 else b"")
        chunks += b"LIST" + struct.pack("<I", len(junk_chunk)) + padded
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Real RIFF/WAVE parser → (int16 mono samples, sample_rate). Walks
    the chunk list generically (word-aligned sizes, unknown chunks like
    LIST skipped) and requires 16-bit PCM."""
    import struct

    buf = bytes(buf)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos: pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", buf, body
            )
            if audio_fmt != 1 or bits != 16 or channels != 1:
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} bits={bits} ch={channels}"
                )
        elif cid == b"data":
            samples = np.frombuffer(buf, dtype="<i2", count=size // 2,
                                    offset=body)
        pos = body + size + (size % 2)    # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


def _byte_moment_features(arr: np.ndarray, denom_base: int,
                          powers: tuple[int, ...]) -> np.ndarray:
    """feature j = j + Σ v^p / (n · base^p) with p cycling through
    ``powers``.

    Exactness contract: the moment sums run in int64 and there is exactly
    ONE float operation per feature (a float64 division, then the float32
    store). Any engine that can sum integers — the DuckDB twins in
    ``__spark_entry__.oracle_sql()`` (``media_features``,
    ``media_decode``) — reproduces the stored float32 bit-for-bit.
    int64 headroom: 255^4 ≈ 4.2e9 (payloads to ~2e9 bytes) for the byte
    domain; 65535^2 ≈ 4.3e9 (to ~2e9 samples) for the sample domain."""
    js = np.arange(_FAKE_DIM, dtype=np.float64)
    n = len(arr)
    if n == 0:
        return np.zeros(_FAKE_DIM, dtype=np.float32)
    s = np.array([int(np.sum(arr ** p)) for p in powers], dtype=np.int64)
    den = np.array([n * denom_base ** p for p in powers], dtype=np.int64)
    vals = s.astype(np.float64) / den.astype(np.float64)
    return (js + vals[np.arange(_FAKE_DIM) % len(powers)]).astype(np.float32)


def synth_real_media_df(spark, docs: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-format media table: even ids get a true 24-bpp
    BMP (dims ``w = 4 + id%13``, ``h = 3 + id%7``; flat RGB byte k =
    ``(id·131 + k·239) % 256`` — step 239 is odd, so the stream cycles
    the full 256 residues), odd ids a true RIFF/WAVE 16-bit PCM mono clip
    (``n = 256 + (id%50)·16`` samples; sample k =
    ``(id·37 + k·101) % 65536 − 32768``) with a LIST junk chunk before
    ``data`` so decoders must actually walk chunks. Both content formulas
    are pure integer functions of (id, k), replayable in SQL — the
    ``media_decode`` oracle regenerates them with ``generate_series`` and
    matches the decoded moments bit-for-bit."""
    out_schema = MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf[id_col].astype("int64"):
                m = int(m)
                if m % 2 == 0:
                    w, h = 4 + m % 13, 3 + m % 7
                    k = np.arange(w * h * 3, dtype=np.int64)
                    px = ((m * 131 + k * 239) % 256).astype(np.uint8)
                    payload = encode_bmp(px.reshape(h, w, 3))
                    rows.append((m, "image", payload, "image/bmp",
                                 len(payload), w, h, 0))
                else:
                    n = 256 + (m % 50) * 16
                    k = np.arange(n, dtype=np.int64)
                    s = ((m * 37 + k * 101) % 65536 - 32768).astype(np.int16)
                    payload = encode_wav(s, junk_chunk=b"\xcd" * 11)
                    rows.append((m, "audio", payload, "audio/wav",
                                 len(payload), 0, 0, n * 1000 // 16000))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "mime", "n_bytes",
                         "width", "height", "duration_ms"],
            )

    return docs.select(id_col).mapInPandas(gen, schema=out_schema)


def _decode_image_batch(payloads: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Image payload → (features, n_units). BMP payloads (magic ``BM``)
    get a REAL decode — moments run over the decoded RGB pixel bytes in
    row-major top-down order, so header gaps, row padding, bottom-up
    storage, and BGR order must all be handled correctly for the
    ``media_decode`` oracle to match. Non-BMP payloads (formats needing
    a codec library absent from this container) keep the deterministic
    raw-byte-moment fake that ``media_features`` hash-verifies."""
    out = np.zeros((len(payloads), _FAKE_DIM), dtype=np.float32)
    n_units = np.zeros(len(payloads), dtype=np.int64)
    for i, buf in enumerate(payloads):
        buf = bytes(buf)
        if buf[:2] == b"BM":
            arr = decode_bmp(buf).reshape(-1).astype(np.int64)
        else:
            arr = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
        n_units[i] = len(arr)
        if len(arr):
            out[i] = _byte_moment_features(arr, 255, (1, 2, 3, 4))
    return out, n_units


def _decode_audio_batch(payloads: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Audio payload → (features, n_units). RIFF/WAVE payloads get a REAL
    chunk-walking decode — moments run over the decoded samples shifted
    to [0, 65535] (u = s + 32768), powers (1, 2) for int64 headroom.
    Other formats keep the legacy fake (image byte-moments × 0.5)."""
    out = np.zeros((len(payloads), _FAKE_DIM), dtype=np.float32)
    n_units = np.zeros(len(payloads), dtype=np.int64)
    wav = np.array([bytes(b)[:4] == b"RIFF" for b in payloads], dtype=bool)
    if (~wav).any():
        legacy = payloads[~wav]
        f, n = _decode_image_batch(legacy)
        out[~wav] = f * np.float32(0.5)
        n_units[~wav] = n
    for i in np.flatnonzero(wav):
        samples, _ = decode_wav(bytes(payloads.iloc[i]))
        u = samples.astype(np.int64) + 32768
        n_units[i] = len(u)
        if len(u):
            out[i] = _byte_moment_features(u, 65535, (1, 2))
    return out, n_units


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
            n_units = pdf["payload"].map(len).to_numpy(dtype=np.int64)
            for kind, decoder in (
                ("image", _decode_image_batch),
                ("audio", _decode_audio_batch),
            ):
                mask = (pdf["kind"] == kind).to_numpy()
                if mask.any():
                    feats[mask], n_units[mask] = decoder(pdf["payload"][mask])
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
                    # decoded unit count: pixel BYTES for images (w·h·3),
                    # samples for audio — header-derived, so a match
                    # against the oracle proves the parser read the
                    # right dimensions; raw byte length for fakes/video
                    "n_units": pd.Series(
                        n_units, index=pdf.index
                    ).astype("int32"),
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
