"""Posting-list codec: delta + varint + block-max, numpy-vectorized.

No JVM codec exists for this layout (SURVEY.md §4.2.2), so it runs inside
Arrow batches — but with ZERO per-row Python loops over posting entries:
``encode_many`` / ``decode_many`` flatten an entire Arrow batch of posting
lists into single numpy arrays, encode/decode all values at once, and split
by byte offsets. Per-value work is a ≤10-iteration vectorized loop over
varint byte positions, independent of how many lists are in the batch.

Layout per posting block (one parquet row):
    doc ids : strictly increasing → delta (first = delta from 0) → varint
    tfs     : varint
    dls     : varint  (per-doc length — BM25 needs it at score time; storing
              it beats a join against the docs table on every query)

Block-max metadata is (max_tf, min_dl) per block — the WAND upper bound is
derived from them at query time under the current avgdl (monotonicity
argument in operators/scorer.py), so bounds survive incremental merges.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64 bits / 7


def _varint_nbytes(values: np.ndarray) -> np.ndarray:
    """Bytes needed per value (uint64 in) — vectorized."""
    v = values.astype(np.uint64, copy=False)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    # bit length via 6 halving steps (64 -> 1)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.uint64(1) << np.uint64(shift))
        nbits[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    nbits += 1  # bit_length of 0 treated as 1
    return (nbits + 6) // 7


def encode_varint_many(arrays: list[np.ndarray]) -> list[bytes]:
    """Varint-encode many uint64 arrays in one vectorized pass."""
    if not arrays:
        return []
    lens = np.array([len(a) for a in arrays], dtype=np.int64)
    if lens.sum() == 0:
        return [b"" for _ in arrays]
    flat = np.concatenate([a.astype(np.uint64, copy=False) for a in arrays])
    nb = _varint_nbytes(flat)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    vals = flat.copy()
    alive = np.arange(len(flat))
    pos = starts.copy()
    for _ in range(_MAX_VARINT_BYTES):
        if len(alive) == 0:
            break
        chunk = (vals[alive] & np.uint64(0x7F)).astype(np.uint8)
        more = vals[alive] >= np.uint64(0x80)
        out[pos[alive]] = chunk | (more.astype(np.uint8) << 7)
        pos[alive] += 1
        vals[alive] >>= np.uint64(7)
        alive = alive[more]
    # split per input array by byte ranges
    row_val_ends = np.cumsum(lens)
    row_byte_ends = np.zeros(len(arrays), dtype=np.int64)
    nonempty = lens > 0
    row_byte_ends[nonempty] = ends[row_val_ends[nonempty] - 1]
    buf = out.tobytes()
    res = []
    prev_end = 0
    for i in range(len(arrays)):
        if lens[i] == 0:
            res.append(b"")
        else:
            end = int(row_byte_ends[i])
            res.append(buf[prev_end:end])
            prev_end = end
    return res


def decode_varint_many(blobs: list[bytes]) -> list[np.ndarray]:
    """Decode many varint byte strings in one vectorized pass."""
    if not blobs:
        return []
    byte_lens = np.array([len(b) for b in blobs], dtype=np.int64)
    if byte_lens.sum() == 0:
        return [np.zeros(0, dtype=np.uint64) for _ in blobs]
    data = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    cont = (data & 0x80) != 0
    terminal = ~cont
    # group index: value id per byte (values never span blob boundaries,
    # and every blob ends on a terminal byte, so global grouping is safe)
    val_id = np.zeros(len(data), dtype=np.int64)
    val_id[1:] = np.cumsum(terminal[:-1])
    n_vals = int(val_id[-1]) + 1
    # position of byte within its value
    starts_mask = np.ones(len(data), dtype=bool)
    starts_mask[1:] = terminal[:-1]
    start_idx = np.flatnonzero(starts_mask)
    pos_in_val = np.arange(len(data)) - start_idx[val_id]
    contrib = (data & 0x7F).astype(np.uint64) << (7 * pos_in_val).astype(np.uint64)
    vals = np.add.reduceat(contrib, start_idx)
    # split values back per blob: values per blob = # terminal bytes per blob
    blob_byte_ends = np.cumsum(byte_lens)
    term_cum = np.cumsum(terminal)
    res = []
    prev_vals = 0
    for i in range(len(blobs)):
        if byte_lens[i] == 0:
            res.append(np.zeros(0, dtype=np.uint64))
            continue
        n_here = int(term_cum[blob_byte_ends[i] - 1]) - prev_vals
        res.append(vals[prev_vals : prev_vals + n_here])
        prev_vals += n_here
    assert prev_vals == n_vals
    return res


def delta_encode_many(sorted_arrays: list[np.ndarray]) -> list[np.ndarray]:
    """Per-array delta (first element kept as-is); input strictly increasing."""
    out = []
    for a in sorted_arrays:
        a = a.astype(np.uint64, copy=False)
        if len(a) == 0:
            out.append(a)
            continue
        d = np.empty_like(a)
        d[0] = a[0]
        np.subtract(a[1:], a[:-1], out=d[1:])
        out.append(d)
    return out


def delta_decode_many(delta_arrays: list[np.ndarray]) -> list[np.ndarray]:
    return [np.cumsum(d.astype(np.uint64, copy=False)) for d in delta_arrays]


def encode_postings_many(
    doc_id_lists: list[np.ndarray],
    tf_lists: list[np.ndarray],
    dl_lists: list[np.ndarray],
) -> tuple[list[bytes], list[bytes], list[bytes]]:
    docs_enc = encode_varint_many(delta_encode_many(doc_id_lists))
    tfs_enc = encode_varint_many(tf_lists)
    dls_enc = encode_varint_many(dl_lists)
    return docs_enc, tfs_enc, dls_enc


def decode_postings_many(
    docs_blobs: list[bytes], tfs_blobs: list[bytes], dls_blobs: list[bytes]
) -> tuple[list[np.ndarray], list[np.ndarray], list[np.ndarray]]:
    doc_ids = delta_decode_many(decode_varint_many(docs_blobs))
    tfs = decode_varint_many(tfs_blobs)
    dls = decode_varint_many(dls_blobs)
    return doc_ids, tfs, dls


def bm25_weight(tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    """Exact float64 BM25 tf/dl part: tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))."""
    tf = tf.astype(np.float64, copy=False)
    dl = dl.astype(np.float64, copy=False)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
