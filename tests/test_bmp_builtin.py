"""The dependency-free real-codec path: functions/bmp.py (pure-numpy
24-bit BMP encode/decode) and the multimodal ``decode='builtin'`` mode,
which REALLY parses BMP bytes instead of replaying a seed. Runs
everywhere; a PIL cross-check asserts byte-format validity where pillow
exists (skips cleanly here)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from web_crawler_search_engine_ray.functions.bmp import decode_bmp24, encode_bmp24


def test_bmp_roundtrip_various_shapes():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 13), (2, 4)]:  # odd widths pad
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_bmp24(encode_bmp24(rgb))
        assert out.shape == rgb.shape
        assert (out == rgb).all()


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp24(b"PNG garbage not a bmp" + b"\x00" * 64)


def test_bmp_pil_crosscheck():
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    data = encode_bmp24(rgb)
    with PIL_Image.open(io.BytesIO(data)) as im:
        pil_rgb = np.asarray(im.convert("RGB"))
    assert (pil_rgb == rgb).all()


def test_builtin_decode_stage_matches_direct_replay(ray_session):
    from web_crawler_search_engine_ray.stages.multimodal import (
        FEATURE_DIM,
        MediaFeatureStage,
        builtin_payload_bmp,
    )

    refs = [f"media://blob/{i}" for i in range(5)]
    spans = [
        [{"kind": "image", "text": "", "media_ref": r, "offset": 0}] for r in refs
    ]
    batch = pa.table(
        {
            "doc_id": pa.array([f"https://h/p{i}" for i in range(len(refs))]),
            "spans": pa.array(spans),
        }
    )
    out = MediaFeatureStage(decode="builtin")(batch)
    assert out.num_rows == len(refs)
    # direct replay: decode the payload bytes and recompute band features
    for i, r in enumerate(refs):
        rgb = decode_bmp24(builtin_payload_bmp(r))
        gray = rgb.astype(np.int64).sum(axis=2) // 3
        bands = gray.reshape(FEATURE_DIM, -1).mean(axis=1)
        want = np.floor((bands - 128.0) / 128.0 * 1000.0 + 0.5) / 1000.0
        got = np.array(out.column("feature")[i].as_py(), dtype=np.float64)
        assert np.allclose(got, want, atol=1e-6)
    # payloads differ per ref (the features aren't degenerate)
    feats = np.array(out.column("feat_norm_e4").to_pylist())
    assert len(set(feats.tolist())) > 1


def test_builtin_resize_stage_matches_direct_replay(ray_session):
    from web_crawler_search_engine_ray.stages.multimodal import (
        BMP_SIDE,
        MediaResizeStage,
        builtin_payload_bmp,
    )

    refs = [f"media://blob/{i}" for i in range(4)]
    spans = [
        [{"kind": "image", "text": "", "media_ref": r, "offset": 0}] for r in refs
    ]
    batch = pa.table(
        {
            "doc_id": pa.array([f"https://h/p{i}" for i in range(len(refs))]),
            "spans": pa.array(spans),
        }
    )
    W = H = 8
    out = MediaResizeStage(width=W, height=H, decode="builtin")(batch)
    assert out.num_rows == len(refs)
    ys = (np.arange(H) * BMP_SIDE) // H
    xs = (np.arange(W) * BMP_SIDE) // W
    for i, r in enumerate(refs):
        rgb = decode_bmp24(builtin_payload_bmp(r))
        want = (rgb.astype(np.int64).sum(axis=2) // 3)[np.ix_(ys, xs)].astype(
            np.uint8
        )
        got = np.frombuffer(out.column("payload")[i].as_py(), dtype=np.uint8)
        assert (got == want.ravel()).all()
        assert out.column("payload_crc")[i].as_py() == int(want.sum())


def test_phash_builtin_group_separation():
    """The REAL pixels-to-hash path (group BMP payload -> encode -> numpy
    decode -> DCT pHash) must put group variants within PHASH_MAX_DIST
    and distinct groups far outside it."""
    from web_crawler_search_engine_ray.stages.multimodal import (
        PHASH_GROUP,
        PHASH_MAX_DIST,
        phash_for_refs,
    )

    refs = [f"media://conf{d:04x}" for d in range(8 * PHASH_GROUP)]
    ph = phash_for_refs(refs, decode="builtin")
    for g in range(8):
        base = ph[g * PHASH_GROUP]
        for v in range(1, PHASH_GROUP):
            dist = bin(int(base) ^ int(ph[g * PHASH_GROUP + v])).count("1")
            assert dist <= PHASH_MAX_DIST, (g, v, dist)
    for g in range(7):
        dist = bin(int(ph[g * PHASH_GROUP]) ^ int(ph[(g + 1) * PHASH_GROUP])).count("1")
        assert dist > PHASH_MAX_DIST, (g, dist)


def test_phash_pairs_builtin_end_to_end(ray_session):
    """phash_pairs(decode='builtin') — the full band-LSH + Hamming-verify
    machinery over REAL decoded pixels — finds exactly the within-group
    pairs of the synthetic groups and nothing across groups."""
    import ray.data

    from web_crawler_search_engine_ray.stages.multimodal import (
        PHASH_GROUP,
        phash_pairs,
    )

    n_groups = 3
    refs = [f"media://conf{d:04x}" for d in range(n_groups * PHASH_GROUP)]
    spans = [
        [{"kind": "image", "text": "", "media_ref": r, "offset": 0}]
        for r in refs
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(
                [f"https://h/p{i}" for i in range(len(refs))], pa.string()
            ),
            "spans": pa.array(spans),
        }
    )
    got = phash_pairs(ray.data.from_arrow(docs), decode="builtin").to_pandas()
    pairs = {tuple(sorted(p)) for p in zip(got["media_a"], got["media_b"])}
    want = {
        tuple(sorted((refs[g * PHASH_GROUP + a], refs[g * PHASH_GROUP + b])))
        for g in range(n_groups)
        for a in range(PHASH_GROUP)
        for b in range(a + 1, PHASH_GROUP)
    }
    # every within-group pair found, nothing across groups
    assert pairs == want
