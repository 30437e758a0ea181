"""Deterministic synthetic image+caption corpus.

Builds the engine's logical input table — per ``BASELINE.json:input_hint``
``(image_id string, bytes binary, w int32, h int32, fmt string,
caption string, phash int64)`` — from a ``documents`` parquet table,
with planted duplicates so dedup pipelines have ground truth:

- variant 0: the original (caption = trimmed document text, pixels
  seeded by the caption hash)
- variant 1 and every variant >= 3: exact duplicates (same caption,
  same pixels)
- variant 2: a near duplicate (caption = text minus its last word,
  pixels = original + small deterministic noise)

``image_id = f"img-{doc_id:08d}-{variant}"``. Everything derives from
the row's content (never from partition or batch position), so the
corpus is identical under any Ray partitioning/parallelism — and the
caption logic is reproducible in ANSI SQL for DuckDB oracles
(``trim(text)`` / ``regexp_replace(trim(text), ' [^ ]*$', '')``).

Images are headerless RGB8 buffers (``fmt='rgb8'``, len = w*h*3),
decodable with numpy alone — real decoders (png/jpeg) are stubbed in
stages/multimodal.py because the sandbox has no image libraries.
Pixels come from a vectorized XXH64 counter keystream seeded by the
caption; the near-dup variant adds uniform noise in [-2, 2] (PSNR
~45 dB, above the BASELINE 40 dB lossy bound).

phash is a real 64-bit average-hash computed from the decoded pixels
(8x8 average-pooled grayscale thresholded at its mean), so
near-duplicate images have nearby phash (small Hamming distance).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import xxh64, xxh64_arrow, xxh64_u64

CORPUS_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
    ("doc_id", pa.int64()),
    ("variant", pa.int32()),
])

_MASK64 = (1 << 64) - 1


def _keystream(seed: int, nbytes: int) -> np.ndarray:
    """Deterministic byte stream: XXH64 over a counter block."""
    nwords = (nbytes + 7) // 8
    ctr = (np.arange(nwords, dtype=np.uint64)
           + np.uint64(seed & _MASK64))  # wraps mod 2^64, deterministic
    return xxh64_u64(ctr).view(np.uint8)[:nbytes]


def _pixels(caption: str, w: int, h: int, noise_seed: int | None) -> np.ndarray:
    img = _keystream(xxh64(caption, 7), w * h * 3).reshape(h, w, 3)
    if noise_seed is not None:
        noise = (_keystream(noise_seed, w * h * 3).astype(np.int16) % 5 - 2
                 ).reshape(h, w, 3)
        img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    return img


def average_phash(img: np.ndarray) -> int:
    """64-bit average hash: 8x8 average-pooled grayscale > mean."""
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(8 + 1) * h) // 8
    xs = (np.arange(8 + 1) * w) // 8
    pooled = np.add.reduceat(np.add.reduceat(gray, ys[:-1], axis=0), xs[:-1], axis=1)
    area = (np.diff(ys)[:, None] * np.diff(xs)[None, :])
    pooled = pooled / area
    bits = (pooled > pooled.mean()).ravel()
    # packbits is bit-for-bit the shift-accumulate loop: bits[0] = MSB
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return val - (1 << 64) if val >= (1 << 63) else val


def drop_last_word(text: str) -> str:
    toks = text.split(" ")
    return " ".join(toks[:-1]) if len(toks) > 1 else text


def make_variants(batch: pa.Table, copies: int = 3, with_bytes: bool = True) -> pa.Table:
    """Expand a documents batch (doc_id, text) into corpus rows
    (doc-major order: d0v0, d0v1, ..., d1v0, ...).

    Stateless ``map_batches`` transform; caption logic is columnar,
    pixel synthesis + phash run per row (inherently per-image work,
    matching what a real decode stage would do).
    """
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(doc_ids)
    # utf8_trim(' ') matches DuckDB trim() (ASCII space only) so the
    # CORPUS_SQL oracle twin stays exact on text with tab/newline edges
    base_cap = pc.utf8_trim(
        batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray)
        else batch["text"], " ")
    near_cap = pc.replace_substring_regex(base_cap, pattern=" [^ ]*$",
                                          replacement="")
    # interleave doc-major: position d*copies + v  <-  variant-major v*n + d
    perm = (np.arange(copies, dtype=np.int64)[None, :] * n
            + np.arange(n, dtype=np.int64)[:, None]).ravel()
    cap_blocks = [near_cap if v == 2 else base_cap for v in range(copies)]
    captions = pa.concat_arrays([pa.array(c) if not isinstance(c, pa.Array) else c
                                 for c in cap_blocks]).take(pa.array(perm))
    did_rep = np.repeat(doc_ids, copies)
    var_rep = np.tile(np.arange(copies, dtype=np.int32), n)
    image_ids = [f"img-{d:08d}-{v}" for d, v in zip(did_rep, var_rep)]
    w = (16 + did_rep % 17).astype(np.int32)
    h = (16 + did_rep % 13).astype(np.int32)

    if with_bytes:
        # per-caption pixel/noise seeds hashed once, vectorized (a
        # scalar xxh64 per caption would dominate the generation cost)
        pix_seeds = xxh64_arrow(base_cap, 7)
        noise_seeds = xxh64_arrow(base_cap, 99)
        buf: list[bytes] = []
        phash = np.empty(n * copies, dtype=np.int64)
        row = 0
        for i in range(n):
            wi, hi = int(w[row]), int(h[row])
            base_img = _keystream(int(pix_seeds[i]), wi * hi * 3) \
                .reshape(hi, wi, 3)
            base_ph = average_phash(base_img)
            near_img = None
            for v in range(copies):
                if v == 2:
                    if near_img is None:
                        noise = (_keystream(int(noise_seeds[i]), wi * hi * 3)
                                 .astype(np.int16) % 5 - 2).reshape(hi, wi, 3)
                        near_img = np.clip(base_img.astype(np.int16) + noise,
                                           0, 255).astype(np.uint8)
                    buf.append(near_img.tobytes())
                    phash[row] = average_phash(near_img)
                else:
                    buf.append(base_img.tobytes())
                    phash[row] = base_ph
                row += 1
        bytes_col = pa.array(buf, type=pa.binary())
    else:
        bytes_col = pa.array([b""] * (n * copies), type=pa.binary())
        phash = np.zeros(n * copies, dtype=np.int64)

    return pa.Table.from_arrays(
        [pa.array(image_ids, type=pa.string()), bytes_col,
         pa.array(w), pa.array(h),
         pa.array(["rgb8"] * (n * copies), type=pa.string()),
         captions, pa.array(phash),
         pa.array(did_rep), pa.array(var_rep)],
        schema=CORPUS_SCHEMA)


# ~30-token boilerplate prefix for the skewed-corpus bench: docs that
# share it have pairwise shingle-Jaccard ≈ 0.6 (BELOW the 0.8 verify
# threshold — no new true duplicates) but collide in LSH bands at high
# rate, flooding band buckets. This is the web-corpus skew shape
# (boilerplate pages / templated captions) hot-band salting exists for.
BOILERPLATE = ("free high resolution stock photo download available now "
               "in our curated gallery collection browse thousands of "
               "similar images updated daily for creative projects and "
               "commercial use worldwide no attribution required instant "
               "access unlimited downloads")


def make_unique_caption_fn(text_col: str = "caption"):
    """map_batches fn: append a content-derived token
    (`` uq{doc_id}x{variant}``) to every caption so each corpus row's
    caption is UNIQUE. The stock corpus has only 2 distinct captions
    per doc no matter how many ``copies`` are generated (variants >= 3
    are exact dups the exact tier collapses) — scaling workloads use
    this to grow *unique* downstream work with ``copies``. The token is
    derived from row content (doc_id, variant), never partition/batch
    position, so the expansion is partitioning-invariant."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        cap = batch[text_col]
        if isinstance(cap, pa.ChunkedArray):
            cap = cap.combine_chunks()
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        var = batch["variant"].to_numpy(zero_copy_only=False)
        # vectorized token build: ' uq{doc}x{var}' via numpy unicode
        tok = np.char.add(
            np.char.add(" uq", did.astype("U20")),
            np.char.add("x", var.astype("U10")))
        out = pc.binary_join_element_wise(cap, pa.array(tok), "")
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, out)

    return fn


def make_boiler_skew_fn(pct: int = 20, text_col: str = "caption"):
    """map_batches fn: prefix the captions of ``pct``% of docs (chosen
    by ``doc_id % 100 < pct`` — content-derived, partition-invariant)
    with BOILERPLATE. Applied AFTER variant expansion, so a doc's
    exact-dup variants stay exact dups and its drop-last-word variant
    stays a true near-dup (shared prefix raises their Jaccard); only
    CROSS-doc boilerplate pairs are planted below the verify threshold
    (hot candidate buckets that verification rejects)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        cap = batch[text_col]
        if isinstance(cap, pa.ChunkedArray):
            cap = cap.combine_chunks()
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = pa.array((did % 100) < pct)
        pre = pc.binary_join_element_wise(
            pa.array([BOILERPLATE] * len(cap)), cap, " ")
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, pc.if_else(mask, pre, cap))

    return fn


def corpus_dataset(sf_dir: str, copies: int = 3, with_bytes: bool = True,
                   parallelism: int | None = None):
    """Lazy Ray Dataset of the synthetic corpus for *sf_dir*.

    The documents parquet is a single row group (one read block), so the
    read is explicitly split into ~2 blocks/CPU before the generation
    map — otherwise one task would synthesize the whole corpus.
    """
    import ray.data

    from ..util import cluster_cpus, ensure_hash_shuffle

    ensure_hash_shuffle()
    if parallelism is None:
        parallelism = max(2, 2 * cluster_cpus())
    # override_num_blocks splits the single-row-group read in the read
    # operator itself (ReadParquet->SplitBlocks) — an explicit
    # .repartition() op costs seconds of extra execution per run
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=parallelism)
    # batch size scales inversely with the expansion factor: a fixed
    # doc batch at high `copies` yields so few synthesis tasks that
    # most of a 16+-CPU cluster idles (and multi-10MB output blocks);
    # target ~2k output rows per task
    batch = max(32, 2048 // max(copies, 1))
    return ds.map_batches(
        lambda b: make_variants(b, copies=copies, with_bytes=with_bytes),
        batch_format="pyarrow", batch_size=batch)


def decode_rgb8(buf: bytes, w: int, h: int) -> np.ndarray:
    """Decode a headerless rgb8 payload back to (h, w, 3) uint8."""
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)


# Shared DuckDB CTE reconstructing the caption-side corpus columns from
# the `documents` view — the oracle twin of make_variants (bytes/phash
# are not SQL-expressible and are excluded from oracled queries).
CORPUS_SQL = """
corpus AS (
    SELECT printf('img-%08d-%d', doc_id, v.variant) AS image_id,
           CASE WHEN v.variant = 2
                THEN regexp_replace(trim(text), ' [^ ]*$', '')
                ELSE trim(text) END AS caption,
           CAST(16 + doc_id % 17 AS INTEGER) AS w,
           CAST(16 + doc_id % 13 AS INTEGER) AS h,
           'rgb8' AS fmt,
           doc_id,
           v.variant
    FROM documents, (SELECT unnest([0, 1, 2]) AS variant) v
)
"""


# ---------------------------------------------------------------------------
# embedding corpus with planted near-duplicates
# ---------------------------------------------------------------------------

EMB_SCHEMA = pa.schema([
    ("emb_id", pa.int64()),
    ("vec_id", pa.int64()),
    ("variant", pa.int32()),
    ("embedding", pa.list_(pa.float32())),
    ("label", pa.int32()),
])


def _unit_noise(vec_ids: np.ndarray, dim: int, seed: int = 1234) -> np.ndarray:
    """Deterministic per-row unit noise vectors: an XXH64 counter
    keystream mapped to floats in [-1, 1), vectorized across the whole
    batch (content-derived — invariant to partitioning)."""
    ctr = (vec_ids.astype(np.uint64)[:, None] * np.uint64(dim)
           + np.arange(dim, dtype=np.uint64)[None, :])
    u = xxh64_u64(ctr.ravel(), seed).reshape(len(vec_ids), dim)
    f = (u >> np.uint64(11)).astype(np.float64) * (2.0 ** -53) * 2.0 - 1.0
    n = np.linalg.norm(f, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return f / n


def make_embedding_variants(batch: pa.Table, eps: float = 0.1) -> pa.Table:
    """Expand (vec_id, embedding, label) into 2 variants per vector:
    variant 0 = original, variant 1 = planted near-duplicate
    ``v + eps*||v||*unit_noise`` (cosine ≈ 1/sqrt(1+eps^2) ≈ 0.995 at
    eps=0.1). ``emb_id = vec_id*2 + variant``."""
    from ..stages.ann import embedding_matrix

    vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int32)
    E = embedding_matrix(batch["embedding"])
    n, d = E.shape
    noise = _unit_noise(vec_ids, d)
    E2 = E + eps * np.linalg.norm(E, axis=1, keepdims=True) * noise
    # interleave (v0, v1) per input row
    out = np.empty((2 * n, d), dtype=np.float64)
    out[0::2] = E
    out[1::2] = E2
    emb_ids = np.empty(2 * n, dtype=np.int64)
    emb_ids[0::2] = vec_ids * 2
    emb_ids[1::2] = vec_ids * 2 + 1
    flat = pa.array(out.ravel().astype(np.float32))
    emb_col = pa.ListArray.from_arrays(
        pa.array(np.arange(2 * n + 1, dtype=np.int32) * d), flat)
    return pa.Table.from_arrays(
        [pa.array(emb_ids), pa.array(np.repeat(vec_ids, 2)),
         pa.array(np.tile(np.array([0, 1], dtype=np.int32), n)),
         emb_col, pa.array(np.repeat(labels, 2))],
        schema=EMB_SCHEMA)


# SQL twin of make_zeroed_variants — the oracle-checkable embedding
# expansion (a DuckDB CTE body over the pre-registered `embeddings`
# view). Unlike make_embedding_variants' hash-keystream noise, zeroing
# one coordinate is expressible in SQL, so pair queries over this
# corpus join the hard oracle gate.
EMB_ZEROED_DIM = 64  # testdata embedding dim; asserted by the engine twin

EMB_ZEROED_SQL = f"""zeroed_variants AS (
    SELECT vec_id * 2 AS emb_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id * 2 + 1,
           list_transform(embedding,
               (x, i) -> CASE WHEN i - 1 = vec_id % {EMB_ZEROED_DIM}
                         THEN 0 ELSE x END)
    FROM embeddings)"""


def make_zeroed_variants(batch: pa.Table) -> pa.Table:
    """SQL-reproducible planted near-dup expansion: variant 1 zeroes
    coordinate ``vec_id % dim`` of the original vector, giving
    cosine(v0, v1) = sqrt(1 - x_i^2/||v||^2) ≈ 0.992 at dim=64 while
    unrelated pairs stay below ~0.6 — a wide, float-precision-proof
    margin around any threshold in between. ``emb_id = vec_id*2 +
    variant``; content-derived, invariant to partitioning. Oracle
    twin: EMB_ZEROED_SQL."""
    vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int32)
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(vec_ids)
    E = np.asarray(col.values, dtype=np.float64).reshape(n, -1)
    d = E.shape[1]
    if d != EMB_ZEROED_DIM:  # keep the DuckDB twin (EMB_ZEROED_SQL,
        # which hardcodes the modulus) from silently diverging
        raise ValueError(
            f"make_zeroed_variants: embedding dim {d} != EMB_ZEROED_DIM"
            f"={EMB_ZEROED_DIM}; update the shared constant so the SQL "
            "oracle twin stays in lockstep")
    E2 = E.copy()
    E2[np.arange(n), vec_ids % d] = 0.0
    out = np.empty((2 * n, d), dtype=np.float64)
    out[0::2] = E
    out[1::2] = E2
    emb_ids = np.empty(2 * n, dtype=np.int64)
    emb_ids[0::2] = vec_ids * 2
    emb_ids[1::2] = vec_ids * 2 + 1
    flat = pa.array(out.ravel().astype(np.float32))
    emb_col = pa.ListArray.from_arrays(
        pa.array(np.arange(2 * n + 1, dtype=np.int32) * d), flat)
    return pa.Table.from_arrays(
        [pa.array(emb_ids), pa.array(np.repeat(vec_ids, 2)),
         pa.array(np.tile(np.array([0, 1], dtype=np.int32), n)),
         emb_col, pa.array(np.repeat(labels, 2))],
        schema=EMB_SCHEMA)


def embedding_corpus(sf_dir: str, eps: float = 0.1,
                     parallelism: int | None = None):
    """Lazy Ray Dataset of the planted-near-dup embedding corpus."""
    import ray.data

    from ..util import cluster_cpus, ensure_hash_shuffle

    ensure_hash_shuffle()
    if parallelism is None:
        parallelism = max(2, 2 * cluster_cpus())
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               override_num_blocks=parallelism)
    return ds.map_batches(lambda b: make_embedding_variants(b, eps),
                          batch_format="pyarrow", batch_size=512)
