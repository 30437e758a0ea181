"""Text-analysis batch operators: token/char counting, quality
scoring, n-gram language ID, and winnowing document fingerprints.

All stateless ``map_batches`` transforms over zero-copy Arrow batches;
tokenization is ``pyarrow.compute`` (utf8_lower + split_whitespace),
per-row reductions are segmented numpy (``np.add.reduceat`` over the
Arrow list offsets) — no Python loop touches row contents.

Engine-side operators (SURVEY.md §2.7: large-scale training-data
pipeline needs beyond the reference's sketch inventory).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import DEFAULT_SEED, xxh64_arrow
from .shingle import _segmented_window_starts, shingle_hashes, unique_per_row


def _tokens(texts) -> tuple[pa.Array, np.ndarray]:
    """Lowercased whitespace tokens of a string array → (flat token
    array with empties removed, int64 per-row offsets)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    n = len(offsets) - 1
    if len(flat) == 0:
        return flat, offsets
    # drop empty tokens (split_whitespace artifacts at string edges)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = lens > 0
    if not keep.all():
        row_of = np.repeat(np.arange(n), np.diff(offsets))
        flat = flat.filter(pa.array(keep))
        counts = np.bincount(row_of[keep], minlength=n)
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    return flat, offsets


def _segment_sum(flat_vals: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum *flat_vals* within each row segment (0 for empty rows)."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=flat_vals.dtype)
    nonempty = np.flatnonzero(np.diff(offsets) > 0)
    if len(nonempty):
        sums = np.add.reduceat(flat_vals, offsets[:-1][nonempty])
        out[nonempty] = sums
    return out


def make_token_stats_fn(id_col: str = "image_id", text_col: str = "caption"):
    """(id, text) → (id, n_tokens, n_chars): whitespace token count and
    unicode char count, both int64 (SQL-oracle friendly)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        _, offsets = _tokens(texts)
        n_chars = pc.cast(pc.utf8_length(
            texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts),
            pa.int64())
        return pa.Table.from_arrays(
            [batch[id_col], pa.array(np.diff(offsets)), n_chars],
            names=[id_col, "n_tokens", "n_chars"])

    return fn


# fixed stopword profiles for the n-gram/stopword language-ID heuristic
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "it", "you", "that", "he",
           "was", "for", "on", "are", "as", "with", "his", "they", "at", "be",
           "this", "have", "from", "or", "one", "had", "by", "but", "not",
           "what", "all", "were", "we", "when", "your", "can", "there", "an"),
    "de": ("der", "die", "und", "den", "von", "zu", "das", "mit", "sich",
           "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine",
           "als", "auch", "es", "an", "werden", "aus", "er", "hat", "dass",
           "sie", "nach", "wird", "bei", "einer", "um", "am", "sind", "noch",
           "wie", "einem", "über", "einen", "so", "zum", "war", "haben"),
    "fr": ("de", "la", "le", "et", "les", "des", "en", "un", "du", "une",
           "que", "est", "pour", "qui", "dans", "par", "plus", "pas", "au",
           "sur", "ne", "se", "ce", "il", "sont", "mais", "comme", "ou",
           "si", "leur", "dont", "aux", "avec", "son", "cette", "être"),
    "es": ("de", "la", "que", "el", "en", "y", "a", "los", "del", "se",
           "las", "por", "un", "para", "con", "no", "una", "su", "al", "lo",
           "como", "más", "pero", "sus", "le", "ya", "o", "este", "sí",
           "porque", "esta", "entre", "cuando", "muy", "sin", "sobre"),
}


def make_langid_fn(id_col: str = "doc_id", text_col: str = "text",
                   min_hits: int = 1):
    """(id, text) → (id, lang, lang_score): stopword-profile language
    identification. ``lang='und'`` when no profile reaches *min_hits*
    token matches; ties break by profile order (en, de, fr, es).

    Vectorized: one ``pc.is_in`` pass per profile over the flat token
    array, segmented sums per row.
    """
    langs = list(LANG_PROFILES)

    def fn(batch: pa.Table) -> pa.Table:
        flat, offsets = _tokens(batch[text_col])
        n = len(offsets) - 1
        hits = np.zeros((len(langs), n), dtype=np.int64)
        for i, lang in enumerate(langs):
            mask = pc.is_in(flat, value_set=pa.array(LANG_PROFILES[lang]))
            hits[i] = _segment_sum(
                mask.to_numpy(zero_copy_only=False).astype(np.int64), offsets)
        best = hits.argmax(axis=0)
        best_hits = hits[best, np.arange(n)]
        n_tok = np.maximum(np.diff(offsets), 1)
        lang_arr = np.where(best_hits >= min_hits,
                            np.array(langs, dtype=object)[best], "und")
        return pa.Table.from_arrays(
            [batch[id_col], pa.array(lang_arr, type=pa.string()),
             pa.array(best_hits / n_tok)],
            names=[id_col, "lang", "lang_score"])

    return fn


def make_quality_fn(id_col: str = "image_id", text_col: str = "caption",
                    stop_lang: str = "en"):
    """(id, text) → per-row quality components + heuristic score:

    - n_tokens, n_chars, n_alpha, n_digit, n_punct (int64)
    - stop_hits (int64): tokens in the *stop_lang* stopword profile
    - mean_token_len, stop_ratio, alpha_ratio (float64)
    - quality (float64 in [0,1]): product of clamped component scores
      (length in range, alpha-dominated, some stopwords) — the standard
      C4/Gopher-style heuristic family, engine-defined.
    """
    stopset = pa.array(LANG_PROFILES[stop_lang])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, offsets = _tokens(texts)
        n_tokens = np.diff(offsets)
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        # per-char classes via byte-level masks on the utf8 buffer would
        # miscount multibyte chars; use arrow kernels per char class
        def count_class(pattern: str) -> np.ndarray:
            return pc.count_substring_regex(texts, pattern=pattern)\
                .to_numpy(zero_copy_only=False).astype(np.int64)

        n_alpha = count_class(r"[A-Za-z]")
        n_digit = count_class(r"[0-9]")
        n_punct = count_class(r"[!-/:-@\[-`{-~]")
        tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        sum_tok_len = _segment_sum(tok_lens, offsets)
        stop_hits = _segment_sum(
            pc.is_in(flat, value_set=stopset).to_numpy(zero_copy_only=False)
            .astype(np.int64), offsets)
        nt = np.maximum(n_tokens, 1)
        mean_token_len = sum_tok_len / nt
        stop_ratio = stop_hits / nt
        alpha_ratio = n_alpha / np.maximum(n_chars, 1)
        len_score = np.clip(n_tokens / 5.0, 0, 1) * np.clip((512 - n_tokens) / 256.0, 0, 1)
        quality = (np.clip(alpha_ratio / 0.6, 0, 1)
                   * np.clip(mean_token_len / 3.0, 0, 1)
                   * np.clip((15 - mean_token_len) / 5.0, 0, 1)
                   * len_score)
        return pa.Table.from_arrays(
            [batch[id_col], pa.array(n_tokens), pa.array(n_chars),
             pa.array(n_alpha), pa.array(n_digit), pa.array(n_punct),
             pa.array(stop_hits), pa.array(mean_token_len),
             pa.array(stop_ratio), pa.array(alpha_ratio), pa.array(quality)],
            names=[id_col, "n_tokens", "n_chars", "n_alpha", "n_digit",
                   "n_punct", "stop_hits", "mean_token_len", "stop_ratio",
                   "alpha_ratio", "quality"])

    return fn


# BPE-ish pre-tokenization pattern (GPT-2-style word/number/punct
# classes, RE2-compatible — no lookaheads, so Arrow and DuckDB agree
# match-for-match). ASCII classes keep the SQL oracle twin exact.
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"


def make_bpe_count_fn(id_col: str = "image_id", text_col: str = "caption"):
    """(id, text) → (id, n_bpe_tokens): BPE-ish token count via one
    vectorized RE2 pass (`pc.count_substring_regex`) — the
    tokenizer-budget estimator of a training-data pipeline, without
    needing a vocab file."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = pc.cast(pc.count_substring_regex(texts, pattern=BPE_PATTERN),
                    pa.int64())
        return pa.Table.from_arrays(
            [batch[id_col], n], names=[id_col, "n_bpe_tokens"])

    return fn


def make_fingerprint_fn(id_col: str = "image_id", text_col: str = "caption",
                        k: int = 3, window: int = 4, seed: int = DEFAULT_SEED):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    k-shingle rolling hashes → min of every *window*-length window →
    per-row distinct set, emitted as (id, fingerprint uint64→int64)
    rows (``flat_map``-shaped output).

    Rows with fewer than one shingle emit nothing; rows with fewer
    shingles than *window* emit the min of what they have.
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, offsets = shingle_hashes(batch[text_col], k, seed)
        lens = np.diff(offsets)
        starts, counts = _segmented_window_starts(offsets, window)
        if len(starts):
            win = np.lib.stride_tricks.sliding_window_view(
                np.concatenate([flat, np.full(window - 1, np.uint64(2**64 - 1))]),
                window)
            mins = win[starts].min(axis=1)
        else:
            mins = np.empty(0, dtype=np.uint64)
        # short rows (0 < len < window): single min fingerprint
        short = np.flatnonzero((lens > 0) & (lens < window))
        if len(short):
            smin = np.minimum.reduceat(flat, offsets[:-1][short])
            counts = counts.copy()
            counts[short] = 1
        else:
            smin = np.empty(0, dtype=np.uint64)
        out_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        out = np.empty(out_off[-1], dtype=np.uint64)
        row_of = np.repeat(np.arange(len(counts)), counts)
        is_full = (lens >= window)[row_of]
        out[is_full] = mins
        out[~is_full] = smin
        fps, fp_off = unique_per_row(out, out_off)
        fp_counts = np.diff(fp_off)
        id_rep = ids.take(pa.array(np.repeat(np.arange(len(ids)), fp_counts)))
        return pa.Table.from_arrays(
            [id_rep, pa.array(fps.astype(np.int64))],
            names=[id_col, "fingerprint"])

    return fn
