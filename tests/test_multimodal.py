"""Multimodal plumbing tests: binaryFile source, metadata struct, and the
Arrow-batched decode UDF shape (decode kernel itself is a documented
deterministic fake — no image libs in this container)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "a.png").write_bytes(b"\x89PNG-fake-payload-a")
    (d / "b.jpg").write_bytes(b"\xff\xd8-fake-payload-bb")
    (d / "c.wav").write_bytes(b"RIFF-fake-payload-ccc")
    return str(d)


def test_load_binary_dir_schema_and_meta(spark, media_dir):
    from kql_engine_spark.multimodal import load_binary_dir

    df = load_binary_dir(spark, media_dir)
    assert df.columns == ["content", "meta"]
    rows = {r.meta.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["a.png"].meta.media_type == "image"
    assert rows["c.wav"].meta.media_type == "audio"
    assert rows["b.jpg"].meta.length == len(b"\xff\xd8-fake-payload-bb")
    assert bytes(rows["a.png"].content) == b"\x89PNG-fake-payload-a"


def test_glob_filter(spark, media_dir):
    from kql_engine_spark.multimodal import load_binary_dir

    df = load_binary_dir(spark, media_dir, glob="*.png")
    assert df.count() == 1


def test_fake_decode_image_deterministic(spark, media_dir):
    from kql_engine_spark.multimodal import fake_decode_image, load_binary_dir

    df = load_binary_dir(spark, media_dir, glob="*.png")
    a = fake_decode_image(df).collect()
    b = fake_decode_image(df).collect()
    assert a == b  # deterministic fake: same payload -> same features
    feat = a[0]
    assert 64 <= feat.width < 256 and 64 <= feat.height < 256
    assert 1 <= feat.channels <= 4
    assert 0.0 <= feat.mean_intensity <= 255.0


def test_real_decode_is_explicit_stub(spark, media_dir):
    from kql_engine_spark.multimodal import decode_image, load_binary_dir

    with pytest.raises(NotImplementedError):
        decode_image(load_binary_dir(spark, media_dir))


def test_fake_resize_deterministic_shape(spark, media_dir):
    from kql_engine_spark.multimodal import fake_resize_image, load_binary_dir

    df = load_binary_dir(spark, media_dir, glob="*.png")
    out = fake_resize_image(df, 32, 16).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height) == (32, 16)
    assert len(bytes(r.resized)) == 32 * 16 // 64
    # deterministic: same input -> same bytes
    again = fake_resize_image(load_binary_dir(spark, media_dir, glob="*.png"), 32, 16).collect()[0]
    assert bytes(again.resized) == bytes(r.resized)


def test_fake_sample_frames_expands_rows(spark, media_dir):
    from kql_engine_spark.multimodal import fake_sample_frames, load_binary_dir

    df = load_binary_dir(spark, media_dir)  # 3 files
    out = fake_sample_frames(df, n_frames=4, fps=2.0).collect()
    assert len(out) == 3 * 4  # 1 -> N expansion
    per_path = {}
    for r in out:
        per_path.setdefault(r.path, []).append(r)
    for rows in per_path.values():
        idxs = sorted(r.frame_idx for r in rows)
        assert idxs == [0, 1, 2, 3]
        ts = {r.frame_idx: r.ts_sec for r in rows}
        assert ts[2] == 1.0  # frame 2 at 2 fps -> 1.0s
        assert len({bytes(r.frame) for r in rows}) == 4  # distinct frames


def test_fake_audio_features(spark, media_dir):
    from kql_engine_spark.multimodal import fake_audio_features, load_binary_dir

    out = fake_audio_features(load_binary_dir(spark, media_dir, glob="*.wav")).collect()
    assert len(out) == 1
    r = out[0]
    assert 1.0 <= r.duration_sec <= 300.0
    assert r.sample_rate in (8000, 16000, 22050, 44100, 48000)
    assert 0.0 <= r.rms <= 1.0
