"""Multimodal (image/audio) span processing stages.

The synthetic web's documents interleave text with media spans
(``kind in {image, ...}`` carrying an opaque ``media_ref``). Real decoders
(PIL/ffmpeg) are not available in this container, so the decode kernel is a
clearly-marked stub: ``decode=deterministic`` produces a seeded fake
feature vector from the media_ref bytes (stable across runs/processes),
``decode=real`` raises NotImplementedError. Everything around the kernel —
the Arrow schema, actor-pool signature, batch sizing, and output layout —
is real and tested, so swapping in a genuine decoder is a one-function
change.

Scale posture: media payloads are large, so the stage is an actor pool
with a small ``batch_size`` and per-actor model/codec state built once in
``__init__`` (SURVEY.md §7.3).
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pyarrow as pa

FEATURE_DIM = 8

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("feature", pa.list_(pa.float32(), FEATURE_DIM)),
        ("feat_norm_e4", pa.int64()),
    ]
)


def _fake_decode(media_ref: str) -> np.ndarray:
    """STUB decode: a deterministic feature vector seeded by the media_ref
    digest. Replace with a real image/audio decoder where available."""
    seed = int.from_bytes(
        hashlib.blake2b(media_ref.encode(), digest_size=4).digest(), "little"
    )
    rng = np.random.RandomState(seed)
    return rng.randn(FEATURE_DIM).astype(np.float32)


class MediaFeatureStage:
    """Actor-pool map_batches stage: docs-with-spans → one feature row per
    media span. Use with ``map_batches(MediaFeatureStage,
    fn_constructor_kwargs={...}, concurrency=N, batch_size=small)``."""

    def __init__(self, media_kinds: tuple = ("image",), decode: str = "deterministic"):
        if decode not in ("deterministic", "real"):
            raise ValueError(decode)
        self.media_kinds = frozenset(media_kinds)
        self.decode = decode
        # per-actor state: a real implementation loads the codec/model here,
        # once per actor, never per batch.
        self._codec_ready = True

    def _decode(self, media_ref: str) -> np.ndarray:
        if self.decode == "real":
            raise NotImplementedError(
                "real media decoding requires image/audio libraries not "
                "present in this environment; use decode='deterministic'"
            )
        return _fake_decode(media_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        out_doc: List[str] = []
        out_ref: List[str] = []
        out_kind: List[str] = []
        feats: List[np.ndarray] = []
        for did, spans in zip(doc_ids, spans_col):
            for s in spans or []:
                if s["kind"] in self.media_kinds and s["media_ref"]:
                    out_doc.append(did)
                    out_ref.append(s["media_ref"])
                    out_kind.append(s["kind"])
                    feats.append(self._decode(s["media_ref"]))
        if feats:
            fmat = np.stack(feats)
            norms = np.floor(
                np.sqrt((fmat.astype(np.float64) ** 2).sum(axis=1)) * 10000.0 + 0.5
            ).astype(np.int64)
            feat_arr = pa.FixedSizeListArray.from_arrays(
                pa.array(fmat.ravel(), pa.float32()), FEATURE_DIM
            )
        else:
            norms = np.empty(0, dtype=np.int64)
            feat_arr = pa.array([], pa.list_(pa.float32(), FEATURE_DIM))
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, pa.string()),
                pa.array(out_ref, pa.string()),
                pa.array(out_kind, pa.string()),
                feat_arr,
                pa.array(norms, pa.int64()),
            ],
            schema=MEDIA_FEATURES_SCHEMA,
        )


RESIZED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("payload", pa.binary()),
    ]
)


class MediaResizeStage:
    """Actor-pool resize stage: media spans → fixed-size image payloads.

    The pixel kernel is a clearly-marked STUB (deterministic bytes seeded
    by media_ref + target size; ``decode='real'`` raises — PIL/ffmpeg are
    not in this container). The Ray plumbing is real: small ``batch_size``
    for large binary payloads, per-actor codec state in ``__init__``,
    typed ``binary`` output column with width/height metadata."""

    def __init__(self, width: int = 64, height: int = 64,
                 media_kinds: tuple = ("image",), decode: str = "deterministic"):
        if decode not in ("deterministic", "real"):
            raise ValueError(decode)
        self.width, self.height = width, height
        self.media_kinds = frozenset(media_kinds)
        self.decode = decode

    def _resize(self, media_ref: str) -> bytes:
        if self.decode == "real":
            raise NotImplementedError(
                "real image resize requires PIL/ffmpeg; use decode='deterministic'"
            )
        seed = hashlib.blake2b(
            f"{media_ref}|{self.width}x{self.height}".encode(), digest_size=8
        ).digest()
        rng = np.random.RandomState(int.from_bytes(seed[:4], "little"))
        return rng.bytes(self.width * self.height)  # 1 byte/px fake payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        out_doc, out_ref, payloads = [], [], []
        for did, spans in zip(doc_ids, spans_col):
            for s in spans or []:
                if s["kind"] in self.media_kinds and s["media_ref"]:
                    out_doc.append(did)
                    out_ref.append(s["media_ref"])
                    payloads.append(self._resize(s["media_ref"]))
        n = len(out_doc)
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, pa.string()),
                pa.array(out_ref, pa.string()),
                pa.array(np.full(n, self.width, dtype=np.int32), pa.int32()),
                pa.array(np.full(n, self.height, dtype=np.int32), pa.int32()),
                pa.array(payloads, pa.binary()),
            ],
            schema=RESIZED_SCHEMA,
        )


FRAMES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),
        ("frame_ts_ms", pa.int64()),
        ("frame", pa.binary()),
    ]
)


class FrameSampleStage:
    """Actor-pool frame-sampling stage: video-like media spans → one row
    per sampled frame (uniform stride). STUB decoder (deterministic fake
    frames + synthetic duration from the media_ref digest; ``decode='real'``
    raises); real Ray-side plumbing: flat_map-shaped output (rows multiply),
    small batches, per-actor decoder state."""

    def __init__(self, num_frames: int = 4, media_kinds: tuple = ("image",),
                 decode: str = "deterministic"):
        if decode not in ("deterministic", "real"):
            raise ValueError(decode)
        self.num_frames = num_frames
        self.media_kinds = frozenset(media_kinds)
        self.decode = decode

    def _duration_ms(self, media_ref: str) -> int:
        d = hashlib.blake2b(media_ref.encode(), digest_size=4).digest()
        return 1000 + int.from_bytes(d, "little") % 29_000  # 1-30 s

    def _frame(self, media_ref: str, idx: int) -> bytes:
        if self.decode == "real":
            raise NotImplementedError(
                "real frame decoding requires ffmpeg; use decode='deterministic'"
            )
        seed = hashlib.blake2b(f"{media_ref}|f{idx}".encode(), digest_size=4).digest()
        rng = np.random.RandomState(int.from_bytes(seed, "little"))
        return rng.bytes(256)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        out_doc, out_ref, idxs, tss, frames = [], [], [], [], []
        for did, spans in zip(doc_ids, spans_col):
            for s in spans or []:
                if s["kind"] in self.media_kinds and s["media_ref"]:
                    dur = self._duration_ms(s["media_ref"])
                    for i in range(self.num_frames):
                        out_doc.append(did)
                        out_ref.append(s["media_ref"])
                        idxs.append(i)
                        tss.append(i * dur // self.num_frames)
                        frames.append(self._frame(s["media_ref"], i))
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, pa.string()),
                pa.array(out_ref, pa.string()),
                pa.array(idxs, pa.int32()),
                pa.array(tss, pa.int64()),
                pa.array(frames, pa.binary()),
            ],
            schema=FRAMES_SCHEMA,
        )
