"""Multimodal (image/audio) span processing stages.

The synthetic web's documents interleave text with media spans
(``kind in {image, ...}`` carrying an opaque ``media_ref``). The decode
kernel has three modes: ``decode='deterministic'`` (default) produces a
seeded fake feature vector / payload from the media_ref (stable across
runs and processes — no decoder library needed); ``decode='builtin'``
synthesizes a VALID 24-bit BMP payload per media_ref (standing in for
the object-store blob read) and genuinely parses those bytes with the
dependency-free numpy codec in ``functions/bmp.py`` — a real decode
path that runs in this container and is PIL-cross-checked where pillow
exists; and ``decode='real'`` treats ``media_ref`` as a filesystem path
and decodes it with PIL, raising NotImplementedError per actor at
``__init__`` when PIL is not importable (it is absent from this
container; that path is covered by a ``pytest.importorskip`` smoke test
that runs wherever PIL exists).
Everything around the kernel — the Arrow schema, actor-pool signature,
batch sizing, and output layout — is identical in both modes.

The deterministic fakes are seeded from ``poly_hash(media_ref)`` (the
reference's base-31 Horner hash) expanded through ``mix32_batch`` — both
of which have exact DuckDB replays (``__ray_entry__._POLY_HASH`` /
``_mix_sql``), so the driver correctness gate can hash-check the
multimodal queries end-to-end (feature norms, payload checksums, frame
timestamps) instead of settling for rows-only. Each stage also emits an
integer checksum column (``feat_norm_e4`` / ``payload_crc`` /
``frame_crc``) precisely so the oracle has a value surface that survives
dropping the raw float32/binary columns.

Scale posture: media payloads are large, so the stage is an actor pool
with a small ``batch_size`` and per-actor model/codec state built once in
``__init__`` (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from ..functions.bmp import decode_bmp24, encode_bmp24
from ..functions.hashing import mix32_batch, poly_hash

def _require_pil():
    """Per-actor gate for ``decode='real'``: return the PIL Image module or
    raise NotImplementedError (runs once in ``__init__``, never per batch)."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError as exc:
        raise NotImplementedError(
            "decode='real' requires PIL (pillow), which is not importable "
            "in this environment; use decode='deterministic'"
        ) from exc


FEATURE_DIM = 8
FEAT_SALT = 101  # feature dim j is mixed with salt FEAT_SALT + j
DUR_SALT = 131  # synthetic media duration
RESIZE_SALT = 400_000  # payload byte i mixed with RESIZE_SALT + i
FRAME_SALT = 500_000  # frame byte i of frame f: FRAME_SALT + f*FRAME_BYTES + i
FRAME_BYTES = 256

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("feature", pa.list_(pa.float32(), FEATURE_DIM)),
        ("feat_norm_e4", pa.int64()),
    ]
)


def _fake_feature_ints(media_refs: List[str]) -> np.ndarray:
    """STUB decode, batched: an (n, FEATURE_DIM) int64 matrix of values in
    [-1000, 1000]; the float feature is this / 1000. Seeded by
    poly_hash(media_ref) through mix32 so a SQL oracle can replay it."""
    n = len(media_refs)
    keys = np.fromiter(
        (poly_hash(r) for r in media_refs), dtype=np.uint64, count=n
    )
    salts = FEAT_SALT + np.arange(FEATURE_DIM, dtype=np.uint64)
    mixed = mix32_batch(
        np.repeat(keys, FEATURE_DIM), np.tile(salts, n)
    ).reshape(n, FEATURE_DIM)
    return mixed.astype(np.int64) % 2001 - 1000


BMP_SIDE = 16  # builtin payloads are 16x16 RGB — 822-byte valid BMPs
BMP_PIX_SALT = 600_000


def _seeded_pixels(seed: int) -> np.ndarray:
    """The ONE copy of the synthetic-payload pixel recipe (mix32 over
    BMP_PIX_SALT+index, mod 256): flat (BMP_SIDE*BMP_SIDE*3,) uint8 —
    shared by builtin_payload_bmp (seed = poly_hash(ref)) and
    builtin_payload_group_bmp (seed = pHash group id)."""
    n = BMP_SIDE * BMP_SIDE * 3
    return (
        mix32_batch(
            np.full(n, seed, dtype=np.uint64),
            BMP_PIX_SALT + np.arange(n, dtype=np.uint64),
        )
        % 256
    ).astype(np.uint8)


def builtin_payload_bmp(media_ref: str) -> bytes:
    """Deterministic VALID BMP payload for a media_ref (the stand-in for
    reading the blob from the object store): 16x16 RGB pixels seeded by
    poly_hash(ref) through mix32, encoded with the real numpy codec."""
    pix = _seeded_pixels(poly_hash(media_ref))
    return encode_bmp24(pix.reshape(BMP_SIDE, BMP_SIDE, 3))


class MediaFeatureStage:
    """Actor-pool map_batches stage: docs-with-spans → one feature row per
    media span. Use with ``map_batches(MediaFeatureStage,
    fn_constructor_kwargs={...}, concurrency=N, batch_size=small)``."""

    def __init__(self, media_kinds: tuple = ("image",), decode: str = "deterministic"):
        if decode not in ("deterministic", "real", "builtin"):
            raise ValueError(decode)
        self.media_kinds = frozenset(media_kinds)
        self.decode = decode
        # per-actor state: the codec loads here, once per actor, never per
        # batch; 'real' raises immediately when PIL is absent. 'builtin'
        # decodes REAL BMP bytes with the dependency-free numpy codec
        # (functions/bmp.py) — the payload is synthesized per media_ref
        # (standing in for the object-store blob read) but the decode is a
        # genuine byte-format parse, PIL-cross-checked where PIL exists.
        self._pil = _require_pil() if decode == "real" else None

    def _decode(self, media_ref: str) -> np.ndarray:
        if self.decode == "real":
            return self._real_features([media_ref])[0] / 1000.0
        if self.decode == "builtin":
            return self._builtin_features([media_ref])[0] / 1000.0
        return (_fake_feature_ints([media_ref])[0] / 1000.0).astype(np.float32)

    def _builtin_features(self, refs: List[str]) -> np.ndarray:
        """media_ref → synthesize its BMP payload → REAL decode → band
        features: mean gray ((r+g+b)//3) of FEATURE_DIM horizontal bands,
        centered and scaled exactly like the PIL path."""
        out = np.empty((len(refs), FEATURE_DIM), dtype=np.int64)
        for i, ref in enumerate(refs):
            rgb = decode_bmp24(builtin_payload_bmp(ref))
            gray = rgb.astype(np.int64).sum(axis=2) // 3
            bands = gray.reshape(FEATURE_DIM, -1).mean(axis=1)
            out[i] = np.floor((bands - 128.0) / 128.0 * 1000.0 + 0.5).astype(
                np.int64
            )
        return out

    def _real_features(self, refs: List[str]) -> np.ndarray:
        """media_ref = image path → (n, FEATURE_DIM) int64 feature in
        [-1000, 1000]: mean grayscale intensity of FEATURE_DIM horizontal
        bands, centered (128 → 0) and scaled — same value surface and
        norm formula as the deterministic mode."""
        out = np.empty((len(refs), FEATURE_DIM), dtype=np.int64)
        for i, ref in enumerate(refs):
            with self._pil.open(ref) as im:
                g = np.asarray(im.convert("L").resize((FEATURE_DIM, FEATURE_DIM)))
            out[i] = np.floor(
                (g.mean(axis=1).astype(np.float64) - 128.0) / 128.0 * 1000.0 + 0.5
            ).astype(np.int64)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        out_doc: List[str] = []
        out_ref: List[str] = []
        out_kind: List[str] = []
        for did, spans in zip(doc_ids, spans_col):
            for s in spans or []:
                if s["kind"] in self.media_kinds and s["media_ref"]:
                    out_doc.append(did)
                    out_ref.append(s["media_ref"])
                    out_kind.append(s["kind"])
        if out_ref:
            if self.decode == "real":
                kmat = self._real_features(out_ref)
            elif self.decode == "builtin":
                kmat = self._builtin_features(out_ref)
            else:
                kmat = _fake_feature_ints(out_ref)
            fmat = (kmat / 1000.0).astype(np.float32)
            # ‖f‖ = sqrt(Σ(k/1000)²) = sqrt(Σk²)/1000; *1e4 → *10 exact
            norms = np.floor(
                np.sqrt((kmat * kmat).sum(axis=1).astype(np.float64)) * 10.0 + 0.5
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
        ("payload_crc", pa.int64()),
    ]
)


class MediaResizeStage:
    """Actor-pool resize stage: media spans → fixed-size image payloads.

    The default pixel kernel is a clearly-marked STUB (deterministic bytes
    seeded by media_ref + target size); ``decode='real'`` resizes the image
    at path ``media_ref`` with PIL (grayscale raw bytes, same output
    layout) and raises per actor when PIL is absent. The Ray plumbing is
    identical either way: small ``batch_size`` for large binary payloads,
    per-actor codec state in ``__init__``, typed ``binary`` output column
    with width/height metadata and an integer byte-sum checksum the SQL
    oracle replays (deterministic mode only)."""

    def __init__(self, width: int = 64, height: int = 64,
                 media_kinds: tuple = ("image",), decode: str = "deterministic"):
        if decode not in ("deterministic", "real", "builtin"):
            raise ValueError(decode)
        self.width, self.height = width, height
        self.media_kinds = frozenset(media_kinds)
        self.decode = decode
        self._pil = _require_pil() if decode == "real" else None

    def _resize(self, media_ref: str) -> bytes:
        return self._resize_batch([media_ref])[0][0]

    def _resize_batch_builtin(self, refs: List[str]) -> tuple:
        """REAL resize path without PIL: decode the BMP payload with the
        numpy codec, nearest-neighbor resample the actual pixel matrix,
        emit grayscale ((r+g+b)//3) raw bytes — same output layout and
        crc formula as the PIL path."""
        payloads, crcs = [], np.empty(len(refs), dtype=np.int64)
        ys = (np.arange(self.height) * BMP_SIDE) // self.height
        xs = (np.arange(self.width) * BMP_SIDE) // self.width
        for i, ref in enumerate(refs):
            rgb = decode_bmp24(builtin_payload_bmp(ref))
            px = (rgb.astype(np.int64).sum(axis=2) // 3)[np.ix_(ys, xs)].astype(
                np.uint8
            )
            payloads.append(px.tobytes())
            crcs[i] = int(px.sum(dtype=np.int64))
        return payloads, crcs

    def _resize_batch_real(self, refs: List[str]) -> tuple:
        payloads, crcs = [], np.empty(len(refs), dtype=np.int64)
        for i, ref in enumerate(refs):
            with self._pil.open(ref) as im:
                px = np.asarray(
                    im.convert("L").resize((self.width, self.height)),
                    dtype=np.uint8,
                )
            payloads.append(px.tobytes())
            crcs[i] = int(px.sum(dtype=np.int64))
        return payloads, crcs

    def _resize_batch(self, refs: List[str]) -> tuple:
        """(payload bytes list, crc int64 array) — one mix per pixel."""
        if self.decode == "real":
            return self._resize_batch_real(refs)
        if self.decode == "builtin":
            return self._resize_batch_builtin(refs)
        n = len(refs)
        npx = self.width * self.height
        keys = np.fromiter(
            (poly_hash(f"{r}|{self.width}x{self.height}") for r in refs),
            dtype=np.uint64,
            count=n,
        )
        salts = RESIZE_SALT + np.arange(npx, dtype=np.uint64)
        px = (
            mix32_batch(np.repeat(keys, npx), np.tile(salts, n)).reshape(n, npx)
            % np.uint64(256)
        ).astype(np.uint8)
        crcs = px.sum(axis=1, dtype=np.int64)
        return [row.tobytes() for row in px], crcs

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        out_doc, out_ref = [], []
        for did, spans in zip(doc_ids, spans_col):
            for s in spans or []:
                if s["kind"] in self.media_kinds and s["media_ref"]:
                    out_doc.append(did)
                    out_ref.append(s["media_ref"])
        n = len(out_doc)
        if n:
            payloads, crcs = self._resize_batch(out_ref)
        else:
            payloads, crcs = [], np.empty(0, dtype=np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, pa.string()),
                pa.array(out_ref, pa.string()),
                pa.array(np.full(n, self.width, dtype=np.int32), pa.int32()),
                pa.array(np.full(n, self.height, dtype=np.int32), pa.int32()),
                pa.array(payloads, pa.binary()),
                pa.array(crcs, pa.int64()),
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
        ("frame_crc", pa.int64()),
    ]
)


class FrameSampleStage:
    """Actor-pool frame-sampling stage: video-like media spans → one row
    per sampled frame (uniform stride). Default decoder is a STUB
    (deterministic fake frames + synthetic duration seeded by the
    media_ref poly-hash); ``decode='real'`` samples frames of the
    multi-frame image (GIF/TIFF) at path ``media_ref`` via PIL's frame
    seeking and raises per actor when PIL is absent. Ray-side plumbing is
    identical: flat_map-shaped output (rows multiply), small batches,
    per-actor decoder state."""

    def __init__(self, num_frames: int = 4, media_kinds: tuple = ("image",),
                 decode: str = "deterministic"):
        if decode not in ("deterministic", "real"):
            raise ValueError(decode)
        self.num_frames = num_frames
        self.media_kinds = frozenset(media_kinds)
        self.decode = decode
        self._pil = _require_pil() if decode == "real" else None

    def _duration_ms(self, media_ref: str) -> int:
        key = np.array([poly_hash(media_ref)], dtype=np.uint64)
        return 1000 + int(mix32_batch(key, DUR_SALT)[0]) % 29_000  # 1-30 s

    def _frame(self, media_ref: str, idx: int) -> bytes:
        key = np.full(FRAME_BYTES, poly_hash(media_ref), dtype=np.uint64)
        salts = FRAME_SALT + idx * FRAME_BYTES + np.arange(
            FRAME_BYTES, dtype=np.uint64
        )
        return (mix32_batch(key, salts) % np.uint64(256)).astype(np.uint8).tobytes()

    def _real_frames(self, media_ref: str) -> list:
        """(idx, ts_ms, frame bytes) per sampled frame: uniform stride over
        the image's frame count (1 for still images), 16×16 grayscale raw
        bytes, timestamps from per-frame duration metadata when present."""
        out = []
        with self._pil.open(media_ref) as im:
            n = getattr(im, "n_frames", 1)
            dur = int(im.info.get("duration", 0)) or 0  # ms per frame
            for i in range(self.num_frames):
                src = min(i * n // self.num_frames, n - 1)
                if n > 1:
                    im.seek(src)
                px = np.asarray(
                    im.convert("L").resize((16, 16)), dtype=np.uint8
                )
                out.append((i, src * dur, px.tobytes()))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        out_doc, out_ref, idxs, tss, frames, crcs = [], [], [], [], [], []
        for did, spans in zip(doc_ids, spans_col):
            for s in spans or []:
                if s["kind"] in self.media_kinds and s["media_ref"]:
                    if self.decode == "real":
                        for i, ts, fb in self._real_frames(s["media_ref"]):
                            out_doc.append(did)
                            out_ref.append(s["media_ref"])
                            idxs.append(i)
                            tss.append(ts)
                            frames.append(fb)
                            crcs.append(int(np.frombuffer(fb, np.uint8).sum()))
                        continue
                    dur = self._duration_ms(s["media_ref"])
                    for i in range(self.num_frames):
                        out_doc.append(did)
                        out_ref.append(s["media_ref"])
                        idxs.append(i)
                        tss.append(i * dur // self.num_frames)
                        fb = self._frame(s["media_ref"], i)
                        frames.append(fb)
                        crcs.append(int(np.frombuffer(fb, np.uint8).sum()))
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, pa.string()),
                pa.array(out_ref, pa.string()),
                pa.array(idxs, pa.int32()),
                pa.array(tss, pa.int64()),
                pa.array(frames, pa.binary()),
                pa.array(crcs, pa.int64()),
            ],
            schema=FRAMES_SCHEMA,
        )


# ---------------------------------------------------------------------------
# perceptual-hash near-duplicate detection over media spans (the image-side
# counterpart of MinHash text dedup: pHash + banded LSH + Hamming verify)
# ---------------------------------------------------------------------------

PHASH_BITS = 48  # 48 not 64: every bit op stays exact in signed-BIGINT SQL
PHASH_BANDS = 4  # 12-bit bands
PHASH_SALT = 700_000
PHASH_VAR_SALT = 800_000
PHASH_GROUP = 4  # consecutive refs model re-encodings of one source image
PHASH_MAX_DIST = 6


def phash_for_refs(
    media_refs: List[str], decode: str = "deterministic"
) -> np.ndarray:
    """Perceptual hashes for media refs, two modes.

    ``decode='deterministic'`` (default, the SQL-oracle-checked mode):
    STUB hash — the synthetic corpus declares each run of PHASH_GROUP
    consecutive media refs to be re-encodings of one source image;
    variant v of group g hashes to g's base bit pattern with v salted
    bit flips, so true near-dups sit at small Hamming distance and
    everything else is ~24 bits apart. Base bits and flip positions come
    from the mix32 avalanche on (g, salt), replayed exactly by the SQL
    oracle.

    ``decode='builtin'``: REAL pixels-to-hash path — each ref's group
    BMP payload is synthesized, encoded to valid BMP bytes, decoded back
    through the numpy codec, and DCT-pHashed (phash_from_pixels). No
    SQL replay (a DCT has no reasonable SQL form); pinned by
    tests/test_bmp_builtin.py instead.

    ``decode='real'``: media_ref is a filesystem path decoded with PIL
    (raises at import when pillow is absent, same gate as the feature
    stages); pinned by tests/test_multimodal_real.py where PIL exists."""
    if decode == "builtin":
        return np.asarray(
            [
                phash_from_pixels(decode_bmp24(builtin_payload_group_bmp(r)))
                for r in media_refs
            ],
            dtype=np.uint64,
        )
    if decode == "real":
        pil = _require_pil()

        def _ph(path: str) -> int:
            with pil.open(path) as img:  # close the fd per image
                return phash_from_pixels(
                    np.asarray(img.convert("RGB"), dtype=np.uint8)
                )

        return np.asarray([_ph(r) for r in media_refs], dtype=np.uint64)
    if decode != "deterministic":  # no silent stub fallback on typos
        raise ValueError(decode)
    d = np.asarray(
        [int(r.rsplit("conf", 1)[1], 16) for r in media_refs], dtype=np.uint64
    )
    g = d // np.uint64(PHASH_GROUP)
    v = d % np.uint64(PHASH_GROUP)
    n = len(d)
    js = np.arange(PHASH_BITS, dtype=np.uint64)
    bits = (
        mix32_batch(
            np.repeat(g, PHASH_BITS), np.tile(np.uint64(PHASH_SALT) + js, n)
        )
        & np.uint64(1)
    ).reshape(n, PHASH_BITS)
    ph = (bits << js).sum(axis=1, dtype=np.uint64)
    for i in range(1, PHASH_GROUP):
        rows = np.nonzero(v >= i)[0]
        if len(rows):
            p = (
                mix32_batch(
                    g[rows],
                    np.uint64(PHASH_VAR_SALT) + np.uint64(64) * v[rows] + np.uint64(i),
                )
                % np.uint64(PHASH_BITS)
            )
            ph[rows] ^= np.uint64(1) << p
    return ph


# --- REAL pHash kernel: the classic DCT recipe over decoded pixels -----
# grayscale -> orthonormal DCT-II -> 7x7 low-frequency block minus the DC
# term (48 coefficients = PHASH_BITS) -> median threshold. Used by
# phash_for_refs(decode='builtin'), where each media_ref's BMP payload is
# synthesized, ENCODED to real BMP bytes and decoded back through the
# dependency-free numpy codec (functions/bmp.py) before hashing — a
# genuine pixels-to-hash path with no PIL. Group payloads make
# consecutive PHASH_GROUP refs true re-encodings (variant v perturbs 3v
# pixel bytes of the group's base image): measured Hamming <= 2 within a
# group vs >= 18 across groups, cleanly split by PHASH_MAX_DIST=6.

_DCT_CACHE: dict = {}


def _dct_matrix(n: int) -> np.ndarray:
    if n not in _DCT_CACHE:
        k = np.arange(n)
        d = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        d[0] *= 1.0 / np.sqrt(2.0)
        _DCT_CACHE[n] = d * np.sqrt(2.0 / n)
    return _DCT_CACHE[n]


def phash_from_pixels(rgb: np.ndarray) -> int:
    """48-bit DCT pHash of an (H, W, 3) uint8 image. Non-16x16 inputs are
    nearest-neighbor sampled to 16x16 first (builtin payloads are 16x16
    already; the sampling path serves decode='real' images)."""
    g = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    if g.shape != (BMP_SIDE, BMP_SIDE):
        yi = (np.arange(BMP_SIDE) * g.shape[0]) // BMP_SIDE
        xi = (np.arange(BMP_SIDE) * g.shape[1]) // BMP_SIDE
        g = g[np.ix_(yi, xi)]
    d = _dct_matrix(BMP_SIDE)
    block = (d @ g @ d.T)[:7, :7].reshape(-1)[1:]  # 48 coeffs, DC dropped
    bits = block > np.median(block)
    return int(
        (bits.astype(np.uint64) << np.arange(PHASH_BITS, dtype=np.uint64)).sum()
    )


def builtin_payload_group_bmp(media_ref: str) -> bytes:
    """VALID BMP payload where consecutive PHASH_GROUP refs are variants
    of ONE base image (group g's pixels are mix32-seeded; variant v
    xors 3v mix32-chosen pixel bytes with 0x1F) — the builtin-decode
    counterpart of the stub's group model, so the REAL pixel path has
    true near-duplicates to find."""
    d = int(media_ref.rsplit("conf", 1)[1], 16)
    g, v = d // PHASH_GROUP, d % PHASH_GROUP
    n = BMP_SIDE * BMP_SIDE * 3
    pix = _seeded_pixels(g)
    if v:
        idx = mix32_batch(
            np.full(3 * v, d, dtype=np.uint64),
            PHASH_VAR_SALT + np.arange(3 * v, dtype=np.uint64),
        ) % np.uint64(n)
        pix[idx] ^= 0x1F
    return encode_bmp24(pix.reshape(BMP_SIDE, BMP_SIDE, 3))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 (numpy 1.x has no bit_count ufunc)."""
    if not len(x):
        return np.zeros(0, dtype=np.int64)
    b = np.unpackbits(x.astype("<u8").view(np.uint8).reshape(len(x), 8), axis=1)
    return b.sum(axis=1).astype(np.int64)


def phash_pairs(docs, decode: str = "deterministic") -> "object":
    """Near-duplicate media pairs over a docs-with-spans Dataset.

    Shape (the 100 TB path): one streaming map computes per-span pHashes
    and emits PHASH_BANDS fixed-width band rows per media; ONE
    groupby(band bucket) shuffle of those narrow rows; candidate pairs
    verified by Hamming distance inside each (tiny) bucket; a second
    narrow groupby dedups pairs found by multiple bands. Mirrors the
    MinHash-LSH text path (pipelines/corpus.py) on the media side.
    ``decode='builtin'`` swaps in the REAL pixels-to-hash kernel (see
    phash_for_refs) with the same banding/verify machinery."""
    import pyarrow.compute as pc

    def band_rows(batch: pa.Table) -> pa.Table:
        refs: List[str] = []
        for spans in batch.column("spans").to_pylist():
            for s in spans or []:
                if s["kind"] == "image" and s["media_ref"]:
                    refs.append(s["media_ref"])
        if not refs:
            return pa.table(
                {
                    "bkey": pa.array([], pa.int64()),
                    "media_ref": pa.array([], pa.string()),
                    "phash": pa.array([], pa.int64()),
                }
            )
        ph = phash_for_refs(refs, decode=decode)
        n = len(refs)
        bs = np.arange(PHASH_BANDS, dtype=np.uint64)
        bvals = (ph[:, None] >> (np.uint64(12) * bs)) & np.uint64(0xFFF)
        bkey = (np.tile(bs, n) * np.uint64(4096)) + bvals.reshape(-1)
        return pa.table(
            {
                "bkey": pa.array(bkey.astype(np.int64), pa.int64()),
                "media_ref": pa.array(np.repeat(refs, PHASH_BANDS), pa.string()),
                "phash": pa.array(
                    np.repeat(ph, PHASH_BANDS).astype(np.int64), pa.int64()
                ),
            }
        )

    def bucket_pairs(tbl: pa.Table) -> pa.Table:
        refs = np.asarray(tbl.column("media_ref").to_pylist(), dtype=object)
        ph = tbl.column("phash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(refs.astype(str), kind="stable")
        refs, ph = refs[order], ph[order]
        # a ref can appear once per band value; within one bucket refs are
        # distinct unless hash-equal — dedup defensively
        uniq = np.concatenate(([True], refs[1:] != refs[:-1]))
        refs, ph = refs[uniq], ph[uniq]
        m = len(refs)
        empty = pa.table(
            {
                "media_a": pa.array([], pa.string()),
                "media_b": pa.array([], pa.string()),
                "hamming": pa.array([], pa.int64()),
                "pkey": pa.array([], pa.string()),
            }
        )
        if m < 2:
            return empty
        ia, ib = np.triu_indices(m, 1)
        ham = _popcount64(ph[ia] ^ ph[ib])
        keep = ham <= PHASH_MAX_DIST
        if not keep.any():
            return empty
        a = refs[ia[keep]].astype(str)
        b = refs[ib[keep]].astype(str)
        return pa.table(
            {
                "media_a": pa.array(a, pa.string()),
                "media_b": pa.array(b, pa.string()),
                "hamming": pa.array(ham[keep], pa.int64()),
                "pkey": pa.array(np.char.add(np.char.add(a, "|"), b), pa.string()),
            }
        )

    def first_row(tbl: pa.Table) -> pa.Table:
        return tbl.slice(0, 1).drop_columns(["pkey"])

    bands = docs.map_batches(band_rows, batch_format="pyarrow")
    pairs = bands.groupby("bkey").map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs.groupby("pkey").map_groups(first_row, batch_format="pyarrow")
