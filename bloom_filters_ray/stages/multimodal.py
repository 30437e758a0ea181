"""Multimodal (image/audio/video) batch operators.

Payloads are opaque ``binary`` columns with typed metadata
(w, h, fmt) per BASELINE.json:input_hint. Stages are callable CLASSES
for ``map_batches(Cls, concurrency=N)`` actor pools — decoder tables /
codec state belong in ``__init__`` (once per actor), per-batch work in
``__call__`` — even though the rgb8 path needs no heavy setup, so the
plumbing (schema, batch sizing, actor signature, output layout) is
real and tested.

Codec support in this sandbox: ``rgb8`` (headerless RGB, decoded with
numpy) and ``gray8`` are REAL; ``png``/``jpeg``/audio/video decoding
requires codec libraries that are not installed and raises
NotImplementedError — the stage contract (decode → (h, w, 3) uint8)
is what a PIL/cv2-backed implementation would slot into.

All per-pixel work is numpy (integer box-filter resize via
``np.add.reduceat``, bilinear via gather + lerp); per-row iteration is
over *images* (inherent: each image is an independent payload), never
over pixels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.synthetic import average_phash

REAL_FORMATS = ("rgb8", "gray8")


def decode_payload(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode one payload to an (h, w, 3) uint8 pixel array."""
    if fmt == "rgb8":
        return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "gray8":
        g = np.frombuffer(buf, dtype=np.uint8).reshape(h, w)
        return np.repeat(g[:, :, None], 3, axis=2)
    raise NotImplementedError(
        f"codec {fmt!r}: png/jpeg/audio/video decoding requires external "
        f"codec libraries not present in this environment (stubbed per "
        f"SURVEY.md §2.7); real formats here: {REAL_FORMATS}")


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = ((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64).clip(0, h - 1)
    xs = ((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    fy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    fx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(fy - y0, 0, 1)[:, None, None]
    wx = np.clip(fx - x0, 0, 1)[None, :, None]
    p = img.astype(np.float64)
    top = p[y0[:, None], x0[None, :]] * (1 - wx) + p[y0[:, None], x1[None, :]] * wx
    bot = p[y1[:, None], x0[None, :]] * (1 - wx) + p[y1[:, None], x1[None, :]] * wx
    return np.clip(top * (1 - wy) + bot * wy + 0.5, 0, 255).astype(np.uint8)


_LUMA = np.array([0.299, 0.587, 0.114])  # Rec. 601

_DCT_CACHE: dict = {}


def dct_basis(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (the published transform:
    B[k,j] = s_k * sqrt(2/n) * cos((2j+1)kπ/2n), s_0 = 1/sqrt(2)),
    cached per size — built once per worker."""
    b = _DCT_CACHE.get(n)
    if b is None:
        k = np.arange(n, dtype=np.float64)[:, None]
        j = np.arange(n, dtype=np.float64)[None, :]
        b = np.sqrt(2.0 / n) * np.cos((2 * j + 1) * k * np.pi / (2 * n))
        b[0] *= 1.0 / np.sqrt(2.0)
        _DCT_CACHE[n] = b
    return b


def dct_phash_batch(lumas: np.ndarray, keep: int = 8) -> np.ndarray:
    """64-bit DCT perceptual hashes for an (n, s, s) float luma batch:
    2-D orthonormal DCT-II as two batched matmuls against the cached
    basis, keep the top-left keep×keep low-frequency block, bit =
    coefficient > block median (the classic pHash scheme: median over
    all keep² coefficients including DC). Invariant to uniform
    brightness scaling (the DCT is linear, the median scales with the
    coefficients). Returns (n,) int64 codes, MSB = coefficient (0,0).
    """
    n = len(lumas)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    D = dct_basis(lumas.shape[1])
    co = D @ lumas.astype(np.float64) @ D.T  # batched over axis 0
    low = co[:, :keep, :keep].reshape(n, keep * keep)
    med = np.median(low, axis=1, keepdims=True)
    packed = np.packbits(low > med, axis=1)
    return np.ascontiguousarray(packed).view(">u8").ravel() \
        .astype(np.uint64).view(np.int64)


def dct_phash(img: np.ndarray, size: int = 32, keep: int = 8) -> int:
    """Scalar DCT pHash of one (h, w, 3) uint8 image: bilinear resize
    to size×size, Rec.601 luma, then the batched kernel."""
    luma = resize_bilinear(img, size, size).astype(np.float64) @ _LUMA
    return int(dct_phash_batch(luma[None])[0])


class DecodeResizeStage:
    """Actor-pool stage: decode payloads and resize to a fixed
    (out_h, out_w), emitting resized rgb8 payloads.

    Use ``ds.map_batches(DecodeResizeStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=B)`` — keep B small: a batch holds
    B · (in_pixels + out_pixels) · 3 bytes of pixel data.
    """

    def __init__(self, out_h: int = 32, out_w: int = 32,
                 method: str = "bilinear", on_error: str = "raise"):
        self.out_h = out_h
        self.out_w = out_w
        self.resize = resize_bilinear if method == "bilinear" else resize_nearest
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        out, ok = [], []
        for buf, w, h, fmt in zip(bufs, ws, hs, fmts):
            try:
                img = decode_payload(buf, int(w), int(h), fmt)
                out.append(self.resize(img, self.out_h, self.out_w).tobytes())
                ok.append(True)
            except NotImplementedError:
                if self.on_error == "raise":
                    raise
                out.append(b"")
                ok.append(False)
        n = len(out)
        return pa.Table.from_arrays(
            [batch["image_id"], pa.array(out, type=pa.binary()),
             pa.array(np.full(n, self.out_w, dtype=np.int32)),
             pa.array(np.full(n, self.out_h, dtype=np.int32)),
             pa.array(["rgb8"] * n, type=pa.string()),
             pa.array(ok, type=pa.bool_())],
            names=["image_id", "bytes", "w", "h", "fmt", "decoded"])


class ImageFeatureStage:
    """Actor-pool stage: decode + extract per-image features —
    mean/std per channel, luma histogram (8 bins), recomputed
    average-phash. Output is flat numeric columns (shuffle-friendly;
    no pixels leave the stage)."""

    def __init__(self, on_error: str = "raise"):
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        n = len(bufs)
        mean = np.zeros((n, 3)); std = np.zeros((n, 3))
        hist = np.zeros((n, 8), dtype=np.int64)
        ph = np.zeros(n, dtype=np.int64)
        for i, (buf, w, h, fmt) in enumerate(zip(bufs, ws, hs, fmts)):
            img = decode_payload(buf, int(w), int(h), fmt)
            mean[i] = img.reshape(-1, 3).mean(axis=0)
            std[i] = img.reshape(-1, 3).std(axis=0)
            luma = img.astype(np.float64).mean(axis=2)
            hist[i] = np.bincount((luma // 32).astype(np.int64).ravel(),
                                  minlength=8)[:8]
            ph[i] = average_phash(img)
        cols = [batch["image_id"]]
        names = ["image_id"]
        for c, ch in enumerate("rgb"):
            cols += [pa.array(mean[:, c]), pa.array(std[:, c])]
            names += [f"mean_{ch}", f"std_{ch}"]
        hist_col = pa.FixedSizeListArray.from_arrays(
            pa.array(hist.ravel(), type=pa.int64()), 8)
        cols += [hist_col, pa.array(ph)]
        names += ["luma_hist", "phash_recomputed"]
        return pa.Table.from_arrays(cols, names=names)


class PhashStage:
    """Actor-pool stage: decode each payload and (re)compute its 64-bit
    phash from pixels — the real image-dedup entry point (a production
    pipeline derives phash from the decoded image, it does not trust
    an input column). ``kind="average"`` is the 8×8 mean hash;
    ``kind="dct"`` is the DCT perceptual hash (per-image decode+resize,
    then ONE batched 2-D DCT over the whole batch). Output replaces
    the ``phash`` column; all other columns pass through."""

    def __init__(self, on_error: str = "raise", kind: str = "average",
                 size: int = 32):
        assert kind in ("average", "dct")
        self.on_error = on_error
        self.kind = kind
        self.size = size
        if kind == "dct":
            dct_basis(size)  # build once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        if self.kind == "dct":
            lumas = np.empty((len(bufs), self.size, self.size))
            for i, (buf, w, h, fmt) in enumerate(zip(bufs, ws, hs, fmts)):
                img = decode_payload(buf, int(w), int(h), fmt)
                lumas[i] = resize_bilinear(img, self.size, self.size) \
                    .astype(np.float64) @ _LUMA
            ph = dct_phash_batch(lumas)
        else:
            ph = np.empty(len(bufs), dtype=np.int64)
            for i, (buf, w, h, fmt) in enumerate(zip(bufs, ws, hs, fmts)):
                img = decode_payload(buf, int(w), int(h), fmt)
                ph[i] = average_phash(img)
        idx = batch.schema.get_field_index("phash")
        if idx >= 0:
            return batch.set_column(idx, "phash", pa.array(ph))
        return batch.append_column("phash", pa.array(ph))


class FrameSampleStage:
    """Actor-pool stage stub for video payloads: sample ``n_frames``
    evenly spaced frames per video. The sandbox has no video codecs;
    decoding raises NotImplementedError, but the stage contract
    (input: bytes+fmt+n_total_frames, output: one row per sampled
    frame with frame_idx) is exercised by tests via the ``rgb8v``
    fake — a concatenation of F equal-sized rgb8 frames."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        ids = batch["image_id"].to_pylist()
        out_id, out_frame, out_bytes = [], [], []
        for vid, buf, w, h, fmt in zip(ids, bufs, ws, hs, fmts):
            if fmt != "rgb8v":
                raise NotImplementedError(
                    f"video codec {fmt!r} requires external libraries; "
                    f"only the rgb8v fake is decodable here")
            frame_sz = int(w) * int(h) * 3
            total = len(buf) // frame_sz
            picks = np.unique((np.arange(self.n_frames) * total)
                              // max(self.n_frames, 1)).clip(0, max(total - 1, 0))
            for f in picks:
                out_id.append(vid)
                out_frame.append(int(f))
                out_bytes.append(buf[f * frame_sz : (f + 1) * frame_sz])
        return pa.Table.from_arrays(
            [pa.array(out_id, type=pa.string()),
             pa.array(out_frame, type=pa.int64()),
             pa.array(out_bytes, type=pa.binary())],
            names=["image_id", "frame_idx", "bytes"])
