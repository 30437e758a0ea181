"""SimHash + Hamming-band near-duplicate operators over 64-bit codes.

The reference library has no SimHash; the north-star pipeline requires
"SimHash over phash/pixel features" (BASELINE.json:6). Implemented
engine-side (SURVEY.md §2.3):

- ``simhash64``: classic Charikar sign-of-weighted-sums over a row's
  token-hash set → one uint64 code per row, fully vectorized
  (segmented bit-count per row, no Python loop over rows).
- ``make_code_band_rows``: pigeonhole banding of any 64-bit code
  column (phash or simhash) into B = 64/bits_per_band chunks — two
  codes within Hamming distance < B are GUARANTEED to share at least
  one chunk, so candidate recall is 1.0 for distance ≤ B-1. Chunk
  values are small (2^bits_per_band · B distinct keys), so at 10^12
  rows buckets are huge: keep bits_per_band ≥ 16 at scale and rely on
  the pair-emitter's hot-bucket capping + salting; at sandbox scale
  8-bit bands give deterministic recall for Hamming ≤ 7.
- ``hamming64`` / ``make_hamming_verifier``: vectorized popcount
  verification of candidate pairs against a broadcast id→code lookup.

Same shuffle discipline as the caption tier: band rows carry only
(band_key, id); codes rejoin at verification via broadcast (small
side) — never the image bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import DEFAULT_SEED, xxh64_u64

_U = np.uint64

# byte-wise popcount table
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 code arrays."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def simhash64(flat_hashes: np.ndarray, offsets: np.ndarray,
              weights: np.ndarray | None = None) -> np.ndarray:
    """SimHash codes for n rows given each row's token-hash multiset
    (Arrow list layout: *flat_hashes* uint64, *offsets* len n+1).

    For bit j of the output: sum over the row's tokens of (+w if token
    bit j set else -w); output bit j = 1 iff the sum > 0. Unweighted
    (w=1) when *weights* is None.
    """
    n = len(offsets) - 1
    flat_hashes = np.asarray(flat_hashes, dtype=np.uint64)
    if weights is None:
        weights = np.ones(len(flat_hashes), dtype=np.int64)
    out = np.zeros(n, dtype=np.uint64)
    # process in chunks of rows to bound the (chunk_tokens, 64) bit matrix
    chunk_tokens = 1 << 14
    shifts = np.arange(64, dtype=np.uint64)
    row = 0
    while row < n:
        end_row = row
        while end_row < n and (offsets[end_row + 1] - offsets[row]) <= chunk_tokens:
            end_row += 1
        if end_row == row:
            end_row = row + 1
        lo, hi = offsets[row], offsets[end_row]
        th = flat_hashes[lo:hi]
        if len(th):
            bits = ((th[:, None] >> shifts[None, :]) & _U(1)).astype(np.int64)
            contrib = (2 * bits - 1) * weights[lo:hi, None]
            starts = offsets[row:end_row] - lo
            lens = np.diff(offsets[row : end_row + 1])
            nonempty = lens > 0
            if nonempty.any():
                sums = np.add.reduceat(contrib, starts[nonempty], axis=0)
                codes = ((sums > 0).astype(np.uint64)
                         << shifts[None, :]).sum(axis=1, dtype=np.uint64)
                idx = np.arange(row, end_row)[nonempty]
                out[idx] = codes
        row = end_row
    return out


def make_text_simhash_fn(id_col: str = "image_id", text_col: str = "caption",
                         shingle_k: int = 3, seed: int = DEFAULT_SEED):
    """map_batches fn: (id, text) → (id, simhash int64) over the text's
    k-shingle hashes."""
    from .shingle import shingle_hashes

    def fn(batch: pa.Table) -> pa.Table:
        flat, offsets = shingle_hashes(batch[text_col], shingle_k, seed)
        codes = simhash64(flat, offsets)
        return pa.Table.from_arrays(
            [batch[id_col], pa.array(codes.astype(np.int64))],
            names=[id_col, "simhash"])

    return fn


def image_feature_tokens(img: "np.ndarray", grid: int = 8,
                         levels: int = 16) -> np.ndarray:
    """Quantized pixel-feature tokens for SimHash over images
    (north_star: "SimHash over phash/pixel features"): the image is
    grid x grid average-pooled per channel, each cell's mean is
    quantized to *levels*, and (cell, channel, level) triplets become
    uint64 tokens. Near-duplicate pixels keep almost all tokens."""
    h, w, c = img.shape
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    pooled = np.add.reduceat(np.add.reduceat(
        img.astype(np.float64), ys[:-1], axis=0), xs[:-1], axis=1)
    area = (np.diff(ys)[:, None, None] * np.diff(xs)[None, :, None])
    q = np.minimum((pooled / area) * levels / 256.0,
                   levels - 1).astype(np.uint64)
    pos = np.arange(grid * grid * c, dtype=np.uint64)
    return (pos << np.uint64(8)) | q.ravel()


def make_image_simhash_fn(id_col: str = "image_id",
                          seed: int = DEFAULT_SEED):
    """map_batches fn: decode each payload, tokenize pixel features,
    SimHash → (id, image_simhash int64). Per-row decode is inherent
    per-image work; tokenization and hashing are vectorized."""

    def fn(batch: pa.Table) -> pa.Table:
        from ..stages.multimodal import decode_payload

        bufs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        toks = []
        for buf, w, h, fmt in zip(bufs, ws, hs, fmts):
            img = decode_payload(buf, int(w), int(h), fmt)
            toks.append(image_feature_tokens(img))
        if toks:
            flat = xxh64_u64(np.concatenate(toks), seed)
            offsets = np.concatenate(
                ([0], np.cumsum([len(t) for t in toks]))).astype(np.int64)
        else:
            flat = np.empty(0, dtype=np.uint64)
            offsets = np.zeros(1, dtype=np.int64)
        codes = simhash64(flat, offsets)
        return pa.Table.from_arrays(
            [batch[id_col], pa.array(codes.astype(np.int64))],
            names=[id_col, "image_simhash"])

    return fn


def make_code_band_rows(code_col: str, id_col: str = "image_id",
                        bits_per_band: int = 8, seed: int = DEFAULT_SEED,
                        hash_keys: bool = True):
    """map_batches fn: rows with a 64-bit code column → (band_key, id)
    rows, one per band. band_key encodes (band index, chunk value);
    *hash_keys* spreads the (small) chunk keyspace over uint64 so the
    downstream hash partitioning balances.
    """
    assert 64 % bits_per_band == 0
    n_bands = 64 // bits_per_band
    mask = _U((1 << bits_per_band) - 1)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        codes = batch[code_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(codes)
        keys = np.empty((n_bands, n), dtype=np.uint64)
        for b in range(n_bands):
            chunk = (codes >> _U(b * bits_per_band)) & mask
            raw = chunk | _U((b + 1) << bits_per_band)
            keys[b] = xxh64_u64(raw, seed) if hash_keys else raw
        id_rep = pa.concat_arrays([ids] * n_bands) if n_bands > 1 else ids
        return pa.Table.from_arrays(
            [pa.array(keys.ravel().astype(np.int64)), id_rep],
            names=["band_key", id_col])

    return fn


def make_code_band_rows_with_code(code_col: str, id_col: str = "image_id",
                                  bits_per_band: int = 8,
                                  seed: int = DEFAULT_SEED):
    """Like make_code_band_rows but carries the 8-byte code with each
    band row, enabling in-bucket verification (the code is the only
    side data Hamming needs — unlike MinHash signatures it is cheap to
    shuffle)."""
    base = make_code_band_rows(code_col, id_col, bits_per_band, seed)
    n_bands = 64 // bits_per_band

    def fn(batch: pa.Table) -> pa.Table:
        out = base(batch)
        codes = batch[code_col]
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        rep = pa.concat_arrays([codes] * n_bands) if n_bands > 1 else codes
        return out.append_column("code", rep)

    return fn


def make_bucket_hamming_emitter(id_col: str = "image_id",
                                max_distance: int = 4,
                                max_bucket: int = 4096):
    """Whole-block fn over hash-partitioned (band_key, id, code) rows:
    per band bucket, compute the pairwise Hamming matrix VECTORIZED and
    emit only verified edges (a < b, hamming <= max_distance) — no
    candidate-pair materialization, no downstream verify stage.

    Duplicate edges across bands are tolerated (union-find is
    idempotent); a bucket larger than *max_bucket* is processed in
    row-chunks against the whole bucket, bounding peak memory at
    O(max_bucket * bucket) per step. The per-bucket cost is inherently
    O(s^2) Hamming ops — at cluster scale keep the chunk alphabet large
    (bits_per_band >= 16) so buckets stay small, and rely on the
    caller's partitioning of band_key.
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keys = batch["band_key"].to_numpy(zero_copy_only=False)
        codes = batch["code"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(keys, kind="stable")
        keys_s = keys[order]
        codes_s = codes[order]
        ids_np = ids.to_numpy(zero_copy_only=False)[order]
        bounds = np.flatnonzero(np.diff(keys_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(keys_s)]))
        a_parts, b_parts, d_parts = [], [], []
        for s0, e0 in zip(starts, ends):
            size = e0 - s0
            if size < 2:
                continue
            c = codes_s[s0:e0]
            members = ids_np[s0:e0]
            step = max_bucket
            for lo in range(0, size, step):
                hi = min(lo + step, size)
                x = c[lo:hi, None] ^ c[None, :]
                ham = _POP8[x.view(np.uint8).reshape(hi - lo, size, 8)]                     .sum(axis=2)
                ii, jj = np.nonzero(ham <= max_distance)
                gi = ii + lo
                keep = gi < jj  # upper triangle only, no self-pairs
                if keep.any():
                    dvals = ham[ii[keep], jj[keep]]
                    gi, jj = gi[keep], jj[keep]
                    ma, mb = members[gi], members[jj]
                    swap = mb < ma
                    a_parts.append(np.where(swap, mb, ma))
                    b_parts.append(np.where(swap, ma, mb))
                    d_parts.append(dvals)
        if not a_parts:
            empty = pa.array([], type=ids.type)
            return pa.Table.from_arrays(
                [empty, empty, pa.array([], type=pa.int64())],
                names=["a", "b", "hamming"])
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(a_parts)),
             pa.array(np.concatenate(b_parts)),
             pa.array(np.concatenate(d_parts).astype(np.int64))],
            names=["a", "b", "hamming"])

    return fn


def make_hamming_verifier(code_ref, max_distance: int,
                          id_col: str = "image_id"):
    """map_batches fn over candidate (a, b) pairs: keep pairs whose
    codes are within *max_distance* Hamming bits, using a broadcast
    (ids, codes) lookup (``ray.put`` once; cached per worker)."""
    from .neardup import _cached_broadcast

    def fn(batch: pa.Table) -> pa.Table:
        lk = _cached_broadcast(code_ref)
        dist = hamming64(lk.rows(batch["a"]), lk.rows(batch["b"]))
        keep = dist <= max_distance
        out = batch.filter(pa.array(keep))
        return out.append_column("hamming", pa.array(dist[keep]))

    return fn
