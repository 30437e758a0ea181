"""Near-duplicate detection operators: MinHash signatures, LSH band
keys, candidate-pair generation, pair verification, union-find.

Shuffle discipline (the part that must survive 10^12 rows):
- band rows carry only ``(band_key: uint64, id)`` — never captions,
  never signatures, never image bytes;
- candidate pairs are generated per hash-partitioned block with
  vectorized numpy group processing (``repartition(P, keys=["band_key"])``
  + whole-block ``map_batches``), not per-group ``map_groups`` calls;
- hot buckets are capped: a bucket larger than ``max_bucket`` emits a
  spanning star+chain (O(s) edges) instead of O(s^2) pairs — enough to
  keep its members connected for clustering while bounding skew
  (SURVEY.md §2.7, §4.2 "salt hot bands");
- pair verification joins pairs back to the signature table — an
  explicit hash join at scale, a broadcast (``ray.put``) fast path
  when the signature table is small.

Signature semantics follow the reference MinHash (positional equality
fraction = ``compareWith``, src/sketch/min-hash.ts:117-132) over
k-shingle sets of the caption (stages/shingle.py).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from ..hashing import DEFAULT_SEED, xxh64_fixed
from ..state.minhash import MinHashFactory
from .shingle import SHINGLE_MASK, shingle_hashes

MAX_VALUE = 1 << 26


@functools.lru_cache(maxsize=8)
def _factory(nb_hashes: int, seed: int) -> MinHashFactory:
    """Worker-local permutation table, built once per (config, worker)."""
    return MinHashFactory(nb_hashes, MAX_VALUE, seed)


def make_signature_fn(id_col: str = "image_id", text_col: str = "caption",
                      nb_hashes: int = 128, shingle_k: int = 3,
                      seed: int = DEFAULT_SEED):
    """map_batches fn: (id, text) → (id, sig fixed_size_list<int64>[k],
    n_shingles). Deterministic from (nb_hashes, seed) alone, so every
    worker derives the identical permutation table."""

    def fn(batch: pa.Table) -> pa.Table:
        factory = _factory(nb_hashes, seed)
        flat, offsets = shingle_hashes(batch[text_col], shingle_k, seed)
        vals = (flat & SHINGLE_MASK).astype(np.int64)
        sigs = factory.signatures(vals, offsets)  # (n, k) int64, -1 if empty
        n, k = sigs.shape
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel(), type=pa.int64()), k)
        return pa.Table.from_arrays(
            [batch[id_col], sig_col,
             pa.array(np.diff(offsets), type=pa.int64())],
            names=[id_col, "sig", "n_shingles"])

    return fn


def sig_matrix(table: pa.Table, sig_col: str = "sig",
               dtype: str = "<i8") -> np.ndarray:
    """Zero-copy-ish (n, k) view of a fixed-width vector column — either
    the FixedSizeList layout or the binary encoding used through hash
    joins (Arrow acero rejects fixed_size_list non-key fields). *dtype*
    applies to the binary branch ("<i8" MinHash sigs, "<f8" normalized
    embeddings)."""
    col = table[sig_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        item = np.dtype(dtype).itemsize
        n = len(col)
        if n == 0:
            return np.empty((0, 0), dtype=dtype)
        # Row width comes from the OFFSETS buffer (offsets[1]-offsets[0]),
        # honoring the array offset — the data buffer may carry 64-byte
        # padding or a leading slice offset, so len(buf)//n is wrong for
        # some (k, n) combinations (e.g. k=30).
        odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
        offs = np.frombuffer(col.buffers()[1], dtype=odt)[
            col.offset : col.offset + n + 1].astype(np.int64)
        widths = np.diff(offs)
        if not (widths == widths[0]).all():
            raise ValueError("ragged binary signature column")
        k = int(widths[0]) // item
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        start = int(offs[0])
        return np.ascontiguousarray(
            data[start : start + n * k * item]).view(dtype).reshape(n, k)
    k = col.type.list_size
    return np.asarray(col.values, dtype=np.int64).reshape(-1, k)


def sig_to_binary_fn(sig_col: str = "sig"):
    """map_batches fn converting the signature column to plain binary
    (8k bytes/row, little-endian int64) so it can ride through Arrow
    hash joins as a payload column."""

    def fn(batch: pa.Table) -> pa.Table:
        m = sig_matrix(batch, sig_col)
        n, k = m.shape
        data = pa.py_buffer(np.ascontiguousarray(m, dtype="<i8").tobytes())
        offsets = pa.py_buffer(
            (np.arange(n + 1, dtype=np.int32) * (k * 8)).tobytes())
        arr = pa.Array.from_buffers(pa.binary(), n, [None, offsets, data])
        i = batch.schema.get_field_index(sig_col)
        return batch.set_column(i, sig_col, arr)

    return fn


def make_band_rows(id_col: str, bands: int, rows_per_band: int,
                   seed: int = DEFAULT_SEED):
    """Returns a map_batches fn: signature table → (band_key, id) rows.

    band_key = XXH64 over the band's r signature values (8r bytes),
    seeded per band, so one uint64 column encodes (band, bucket).
    Rows with empty signatures (sig[0] == -1) emit nothing.
    """

    def fn(batch: pa.Table) -> pa.Table:
        sigs = sig_matrix(batch)
        nonempty = sigs[:, 0] != -1
        sigs = sigs[nonempty]
        ids = batch[id_col].filter(pa.array(nonempty))
        n = len(sigs)
        keys = np.empty((bands, n), dtype=np.uint64)
        for b in range(bands):
            band = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            keys[b] = xxh64_fixed(
                np.ascontiguousarray(band).view(np.uint8).reshape(n, -1),
                seed + 1000003 * (b + 1))
        id_rep = pa.chunked_array([ids] * bands) if bands > 1 else ids
        return pa.Table.from_arrays(
            [pa.array(keys.ravel().astype(np.int64)),
             id_rep.combine_chunks() if isinstance(id_rep, pa.ChunkedArray) else id_rep],
            names=["band_key", id_col])

    return fn


def make_salt_fn(hot_keys, n_salt: int, id_col: str,
                 seed: int = DEFAULT_SEED, preserve_top_bit: bool = False):
    """Salt HOT band keys (north_star: "explicit salting of hot
    bands"): rows whose band_key is in *hot_keys* are rescattered into
    ``n_salt`` sub-buckets keyed by hash(id) — a hot bucket's
    candidate-pair work then spreads across partitions and is bounded
    per sub-bucket.

    ``preserve_top_bit=True`` keeps bit 63 of the original key in the
    salted key (salt entropy confined to the low 63 bits), so the
    merged band tier's tier tag (pipelines/full.py: caption keys have
    the top bit cleared, phash keys set) survives salting and salted
    rows still route to the right in-block emitter by key sign.

    Recall semantics: pairs split across sub-buckets are lost IN THAT
    BAND only; a true near-dup pair that also collides in any cold
    band is still found, so realistic skew (hot buckets = boilerplate)
    costs nothing — tests/test_salting.py asserts bit-equal output on
    the standard corpus and bounded loss on an adversarial fixture
    where EVERY band is hot. The pair emitter's max_bucket star+chain
    cap remains the deterministic connectivity-preserving fallback;
    salting is the opt-in load-spreader. Hot keys come from a CMS/TopK
    pass over the band rows (stages/sketch_aggs.build_topk).
    """
    hot_arr = np.array(sorted(hot_keys), dtype=np.int64)
    from ..hashing import xxh64_u64

    _TOP = np.uint64(1) << np.uint64(63)

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch["band_key"].to_numpy(zero_copy_only=False)
        mask = np.isin(keys, hot_arr)
        if not mask.any():
            return batch
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        from ..hashing import xxh64_arrow

        salt = xxh64_arrow(ids, 31337) % np.uint64(n_salt)
        keys_u = keys.astype(np.int64).view(np.uint64)
        mixed = xxh64_u64((keys_u * np.uint64(0x9E3779B185EBCA87))
                          ^ (salt + np.uint64(1)), seed + 77)
        if preserve_top_bit:
            mixed = (mixed & ~_TOP) | (keys_u & _TOP)
        out = np.where(mask, mixed.view(np.int64), keys)
        i = batch.schema.get_field_index("band_key")
        return batch.set_column(i, "band_key", pa.array(out))

    return fn


def auto_hot_threshold(n_band_rows: int, partitions: int,
                       max_bucket: int) -> int:
    """Auto-derived hot-band threshold (``DedupConfig
    hot_threshold="auto"``): a bucket is hot when its TopK-estimated
    size exceeds ~2× a partition's fair share of the band-row stream —
    the point where one bucket skews a shuffle receiver — floored at
    4×max_bucket so small corpora never salt (the pair emitter's cap
    already bounds their worst case)."""
    fair_share = -(-2 * n_band_rows // max(1, partitions))
    return max(4 * max_bucket, fair_share)


def make_pair_emitter(id_col: str, max_bucket: int = 128):
    """Returns a whole-block map_batches fn over hash-partitioned band
    rows: groups by band_key (vectorized np.unique within the block)
    and emits candidate pairs (a < b).

    Buckets with 2..max_bucket members emit all pairs; larger buckets
    emit a star from the minimum id plus a sorted chain (2(s-1) edges,
    reported in the ``capped`` column of the stats row) — their members
    stay mutually reachable for connected components.
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keys = np.asarray(batch["band_key"].to_numpy(zero_copy_only=False))
        order = np.argsort(keys, kind="stable")
        keys_s = keys[order]
        bounds = np.flatnonzero(np.diff(keys_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(keys_s)]))
        ids_np = ids.to_numpy(zero_copy_only=False)[order]
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):
            size = e - s
            if size < 2:
                continue
            members = np.sort(ids_np[s:e])
            if size <= max_bucket:
                iu, ju = np.triu_indices(size, k=1)
                a_parts.append(members[iu])
                b_parts.append(members[ju])
            else:
                # capped: star from min + chain keeps the bucket connected
                a_parts.append(np.concatenate([np.repeat(members[0], size - 1),
                                               members[:-1]]))
                b_parts.append(np.concatenate([members[1:], members[1:]]))
        if not a_parts:
            return pa.Table.from_arrays(
                [pa.array([], type=ids.type), pa.array([], type=ids.type)],
                names=["a", "b"])
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        return pa.Table.from_arrays([pa.array(a), pa.array(b)], names=["a", "b"])

    return fn


def dedupe_pairs_block(batch: pa.Table) -> pa.Table:
    """Whole-block pair dedupe (same (a,b) always hash-partitions to the
    same block, so block-local dedupe is global); keeps the multiplicity
    as n_bands."""
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return batch.append_column("n_bands", pa.array([], type=pa.int64()))
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    new = np.ones(len(a_s), dtype=bool)
    new[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
    idx = np.flatnonzero(new)
    counts = np.diff(np.concatenate((idx, [len(a_s)])))
    return pa.Table.from_arrays(
        [pa.array(a_s[idx]), pa.array(b_s[idx]), pa.array(counts.astype(np.int64))],
        names=["a", "b", "n_bands"])


_WORKER_CACHE: dict = {}


_LOOKUP_SEED = 0x5EED


class _BroadcastLookup:
    """Worker-local broadcast (ids, matrix) lookup. Keys are XXH64
    hashes of the ids sorted as uint64 — per-batch lookups hash the
    Arrow column vectorized and binary-search, no per-row Python and
    no per-batch string materialization. If the id set has a 64-bit
    hash collision (detected at build; ~n²/2⁶⁴) the structure falls
    back to exact sorted-string search, so the fast path never trades
    correctness. The matrix is NOT permuted — it stays the zero-copy
    plasma-backed array; ``rows()`` gathers only the queried rows."""

    def __init__(self, ids, matrix):
        from ..hashing import xxh64_arrow

        self.matrix = matrix
        ids_arr = ids if isinstance(ids, pa.Array) else pa.array(ids)
        if pa.types.is_string(ids_arr.type) or \
                pa.types.is_large_string(ids_arr.type) or \
                pa.types.is_binary(ids_arr.type):
            h = xxh64_arrow(ids_arr, _LOOKUP_SEED)
        else:
            h = ids_arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        if len(hs) > 1 and (hs[1:] == hs[:-1]).any():
            # exact fallback: sorted original keys (string compares)
            keys = np.asarray(ids_arr.to_pylist())
            order = np.argsort(keys, kind="stable")
            self._sorted = keys[order]
            self._hashed = False
        else:
            self._sorted = hs
            self._hashed = True
        self._perm = order

    def positions(self, col) -> np.ndarray:
        """Matrix row index per id in *col*."""
        from ..hashing import xxh64_arrow

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self._hashed:
            if pa.types.is_string(col.type) or \
                    pa.types.is_large_string(col.type) or \
                    pa.types.is_binary(col.type):
                keys = xxh64_arrow(col, _LOOKUP_SEED)
            else:
                keys = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            keys = np.asarray(col.to_pylist())
        pos = np.searchsorted(self._sorted, keys)
        pos = np.minimum(pos, len(self._sorted) - 1)
        if len(keys) and not (self._sorted[pos] == keys).all():
            raise KeyError("id missing from broadcast lookup table")
        return self._perm[pos]

    def rows(self, col) -> np.ndarray:
        return self.matrix[self.positions(col)]


def _cached_broadcast(sig_ref) -> _BroadcastLookup:
    """Fetch-once-per-worker broadcast lookup (plasma shared memory)."""
    key = sig_ref.hex() if hasattr(sig_ref, "hex") else id(sig_ref)
    hit = _WORKER_CACHE.get(key)
    if hit is None:
        import ray

        ids, sigs = ray.get(sig_ref)
        hit = _BroadcastLookup(ids, sigs)
        _WORKER_CACHE.clear()
        _WORKER_CACHE[key] = hit
    return hit


class MapWithIdentity:
    """Vectorized ``{k: v}.get(x, x)`` over Arrow columns: keys are
    hashed to sorted uint64 (one vectorized XXH64 pass per batch, no
    per-batch string materialization); candidate hits are confirmed
    with an exact Arrow string compare, so hash collisions cannot
    mis-map; output is composed with C++ take/if_else kernels."""

    def __init__(self, keys, values):
        from ..hashing import xxh64_arrow

        self.keys = keys if isinstance(keys, pa.Array) else pa.array(keys)
        self.values = values if isinstance(values, pa.Array) \
            else pa.array(values)
        if len(self.keys) and (pa.types.is_string(self.keys.type)
                               or pa.types.is_large_string(self.keys.type)
                               or pa.types.is_binary(self.keys.type)):
            h = xxh64_arrow(self.keys, _LOOKUP_SEED)
            self._string = True
        else:
            h = self.keys.to_numpy(zero_copy_only=False).astype(np.uint64) \
                if len(self.keys) else np.empty(0, dtype=np.uint64)
            self._string = False
        self._perm = np.argsort(h, kind="stable")
        self._sorted = h[self._perm]

    def __call__(self, col) -> pa.Array:
        import pyarrow.compute as pc

        from ..hashing import xxh64_arrow

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(self._sorted) == 0 or len(col) == 0:
            return col
        if self._string:
            h = xxh64_arrow(col, _LOOKUP_SEED)
        else:
            h = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.minimum(np.searchsorted(self._sorted, h),
                         len(self._sorted) - 1)
        hit = self._sorted[pos] == h
        idx = pa.array(self._perm[pos])
        # exact confirmation kills 64-bit collisions on missing keys
        confirmed = pc.and_(pa.array(hit),
                            pc.equal(col, self.keys.take(idx)))
        return pc.if_else(confirmed, self.values.take(idx), col)


def make_broadcast_verifier(sig_ref, threshold: float):
    """Pair verification against a broadcast signature lookup
    (``ray.put`` once on the driver; each worker fetches it once).

    The small-side fast path: valid while the signature table fits in
    the object store. The scale path is the two-sided hash join in
    ``pipelines.dedup.verify_pairs_join``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        lk = _cached_broadcast(sig_ref)
        sim = (lk.rows(batch["a"]) == lk.rows(batch["b"])).mean(axis=1)
        keep = sim >= threshold
        out = batch.filter(pa.array(keep))
        return out.append_column("sim", pa.array(sim[keep]))

    return fn


def verify_block(batch: pa.Table, threshold: float) -> pa.Table:
    """Verify pairs when both sides' signatures are already columns
    (post-join layout: sig_a, sig_b)."""
    sa = sig_matrix(batch, "sig_a")
    sb = sig_matrix(batch, "sig_b")
    sim = (sa == sb).mean(axis=1)
    keep = sim >= threshold
    out = batch.select(["a", "b", "n_bands"]).filter(pa.array(keep))
    return out.append_column("sim", pa.array(sim[keep]))


def make_rep_block(id_col: str, hash_col: str):
    """Whole-block (post hash-partition) exact-dup resolution:
    representative = min id per *hash_col* group. Valid globally because
    the keyed repartition co-locates equal hashes in one block."""

    def fn(batch: pa.Table) -> pa.Table:
        h = batch[hash_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        hs = h[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        group_of = np.cumsum(first) - 1
        rep_sorted = ids[order][np.flatnonzero(first)][group_of]
        rep = np.empty_like(rep_sorted)
        rep[order] = rep_sorted
        out = batch.append_column("rep_id", pa.array(rep))
        return out.append_column("is_rep", pa.array(rep == ids))

    return fn


class UnionFind:
    """Driver-side union-find with deterministic min-id labels.

    Scale note: holds one entry per id that appears in a verified edge
    — the duplicate set, typically orders of magnitude smaller than the
    corpus. For edge sets too large for one driver, swap in the
    large-star/small-star groupby rounds (documented in SURVEY §2.7).
    """

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return
        # deterministic: smaller id becomes the root
        if ry < rx:
            rx, ry = ry, rx
        self.parent[ry] = rx

    def union_many(self, a, b) -> None:
        """Batched edge ingestion: contract the batch's edges to
        batch-local components first (vectorized min-label propagation
        with pointer jumping over integer codes — no per-edge Python),
        then apply only the <= n_nodes (node → batch root) forest edges
        to the global dict state. LSH emits the same pair from several
        bands, so a batch typically has far fewer nodes than edges.

        Component sets are preserved exactly (each node unions with its
        batch-local root), and the global min-id-root invariant of
        ``union`` makes the final labels independent of which
        representative the batch contraction picked.
        """
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        n = len(a)
        if n == 0:
            return
        enc = pa.concat_arrays([a, b]).dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        ca, cb = codes[:n], codes[n:]
        n_nodes = len(enc.dictionary)
        label = np.arange(n_nodes, dtype=np.int64)
        while True:
            before = label.copy()
            m = np.minimum(label[ca], label[cb])
            np.minimum.at(label, ca, m)
            np.minimum.at(label, cb, m)
            np.minimum(label, label[label], out=label)  # pointer jump
            if np.array_equal(label, before):
                break
        while True:  # flatten to fixpoint
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        ids = enc.dictionary.to_pylist()
        for i in np.flatnonzero(label != np.arange(n_nodes)):
            self.union(ids[int(i)], ids[int(label[i])])

    def components(self) -> dict:
        """id → min-id-of-component for every seen id."""
        return {x: self.find(x) for x in list(self.parent)}
