"""Corpus IO: the engine's logical input is a Lance (or Parquet) table
of image + caption pairs with columns (image_id string, bytes binary,
w int32, h int32, fmt string, caption string, phash int64) —
BASELINE.json:input_hint.

``read_corpus_table`` resolves the storage format:
- ``.lance`` datasets go through ``ray.data.read_lance`` when the
  ``lance`` package is importable (it is NOT installed in this
  sandbox — verified — so the path is import-gated and exercised by a
  format-dispatch test, not an integration test);
- parquet everywhere else (the sandbox test corpus).

Both return the same lazy ``ray.data.Dataset`` contract, so every
pipeline in this repo is storage-agnostic: swap the reader, keep the
graph.
"""

from __future__ import annotations

import os

CORPUS_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


def lance_available() -> bool:
    try:  # pragma: no cover - depends on environment
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def detect_format(path: str) -> str:
    """"lance" for .lance dataset dirs, else "parquet"."""
    if path.rstrip("/").endswith(".lance"):
        return "lance"
    if os.path.isdir(path) and any(
            name.endswith(".lance") or name == "_versions"
            for name in (os.listdir(path) if os.path.isdir(path) else [])):
        return "lance"
    return "parquet"


def read_corpus_table(path: str, columns: list[str] | None = None,
                      fmt: str = "auto", **read_kwargs):
    """Lazy Dataset over a corpus table stored as Lance or Parquet.

    Column pruning is pushed to the reader in both formats — a dedup
    pass that only needs (image_id, caption) never lifts pixel bytes
    off storage.
    """
    import ray.data

    from ..util import ensure_hash_shuffle

    ensure_hash_shuffle()
    if fmt == "auto":
        fmt = detect_format(path)
    if fmt == "lance":
        if not lance_available():
            raise ImportError(
                "the 'lance' package is not installed in this environment; "
                "install pylance or store the corpus as parquet")
        return ray.data.read_lance(path, columns=columns, **read_kwargs)
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=columns, **read_kwargs)
    raise ValueError(f"unknown corpus format: {fmt}")
