"""Real-decode escape hatch for the multimodal stages (VERDICT r2 next-round
item 7): ``decode='real'`` resolves ``media_ref`` as an image path and
decodes with PIL. These tests run wherever pillow is importable and skip
cleanly in environments without it (this container has no PIL); the
deterministic-stub default paths are covered by test_corpus_ops.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

PIL_Image = pytest.importorskip("PIL.Image")


def _doc_batch(refs):
    spans = [
        [{"kind": "image", "text": "", "media_ref": r, "offset": 0}] for r in refs
    ]
    return pa.table(
        {
            "doc_id": pa.array([f"https://h/p{i}" for i in range(len(refs))]),
            "spans": pa.array(spans),
        }
    )


@pytest.fixture()
def png_files(tmp_path):
    paths = []
    for i in range(3):
        px = np.full((32, 32), 40 * i + 10, dtype=np.uint8)
        px[:16] = 255 - px[:16]  # non-uniform so band features differ
        p = tmp_path / f"img{i}.png"
        PIL_Image.fromarray(px, mode="L").save(p)
        paths.append(str(p))
    return paths


def test_real_feature_stage(png_files):
    from web_crawler_search_engine_ray.stages.multimodal import (
        FEATURE_DIM,
        MediaFeatureStage,
    )

    stage = MediaFeatureStage(decode="real")
    out = stage(_doc_batch(png_files))
    assert out.num_rows == len(png_files)
    feats = out.column("feature").to_pylist()
    assert all(len(f) == FEATURE_DIM for f in feats)
    # deterministic across calls, distinct across distinct images
    again = stage(_doc_batch(png_files))
    assert out.column("feat_norm_e4").equals(again.column("feat_norm_e4"))
    assert len(set(out.column("feat_norm_e4").to_pylist())) > 1


def test_real_resize_stage(png_files):
    from web_crawler_search_engine_ray.stages.multimodal import MediaResizeStage

    stage = MediaResizeStage(width=8, height=8, decode="real")
    out = stage(_doc_batch(png_files))
    assert out.num_rows == len(png_files)
    for payload, crc in zip(
        out.column("payload").to_pylist(), out.column("payload_crc").to_pylist()
    ):
        assert len(payload) == 8 * 8
        assert crc == int(np.frombuffer(payload, np.uint8).sum())


def test_real_frame_sample_gif(tmp_path):
    from web_crawler_search_engine_ray.stages.multimodal import FrameSampleStage

    frames = [
        PIL_Image.fromarray(np.full((16, 16), 60 * i, dtype=np.uint8), mode="L")
        for i in range(4)
    ]
    gif = tmp_path / "anim.gif"
    frames[0].save(
        gif, save_all=True, append_images=frames[1:], duration=100, loop=0
    )
    stage = FrameSampleStage(num_frames=2, decode="real")
    out = stage(_doc_batch([str(gif)]))
    assert out.num_rows == 2
    assert out.column("frame_idx").to_pylist() == [0, 1]
    # frames come from different source frames of the animation
    crcs = out.column("frame_crc").to_pylist()
    assert crcs[0] != crcs[1]


def test_missing_pil_raises(monkeypatch):
    """Simulate a PIL-less environment: the gate raises per actor at
    __init__, exactly what a no-PIL container sees."""
    import builtins

    from web_crawler_search_engine_ray.stages import multimodal as M

    real_import = builtins.__import__

    def no_pil(name, *a, **k):
        if name == "PIL" or name.startswith("PIL."):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_pil)
    with pytest.raises(NotImplementedError):
        M.MediaFeatureStage(decode="real")


def test_real_phash_near_dup_separation(tmp_path):
    """phash_for_refs(decode='real'): a slightly perturbed re-save of an
    image hashes within PHASH_MAX_DIST of the original; an unrelated
    image lands far away."""
    from web_crawler_search_engine_ray.stages.multimodal import (
        PHASH_MAX_DIST,
        phash_for_refs,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    variant = base.copy()
    idx = rng.integers(0, 32, size=(6, 2))
    variant[idx[:, 0], idx[:, 1]] ^= 0x1F  # 6 perturbed pixels
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    paths = []
    for name, arr in [("base", base), ("variant", variant), ("other", other)]:
        p = tmp_path / f"{name}.png"
        PIL_Image.fromarray(arr, mode="RGB").save(p)
        paths.append(str(p))
    ph = phash_for_refs(paths, decode="real")
    near = bin(int(ph[0]) ^ int(ph[1])).count("1")
    far = bin(int(ph[0]) ^ int(ph[2])).count("1")
    assert near <= PHASH_MAX_DIST, near
    assert far > PHASH_MAX_DIST, far
