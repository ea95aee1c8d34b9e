"""Multimodal plumbing: schema, Arrow batch iteration, decode stub gating,
frame-sampling plan — the Spark-side contract is real; codecs are stubbed."""

import pytest

from gbif_data_validator_spark.operators import multimodal as mm


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x00" * 10)


def test_decode_fake_is_deterministic():
    a = mm.decode_image(b"payload-bytes", fake=True)
    b = mm.decode_image(b"payload-bytes", fake=True)
    assert (a == b).all() and a.shape == (4, 4, 3)


def test_feature_extraction_pipeline(spark):
    def names_types(schema):
        return [(f.name, f.dataType.simpleString()) for f in schema.fields]

    media = mm.synth_media(spark, 200)
    assert names_types(media.schema) == names_types(mm.MEDIA_SCHEMA)
    feats = mm.extract_media_features(media)
    assert names_types(feats.schema) == names_types(mm.FEATURES_SCHEMA)
    rows = feats.collect()
    assert len(rows) == 200
    for r in rows[:10]:
        assert len(r.features) == mm.N_FEATURES
        assert abs(sum(r.features) - 1.0) < 1e-3  # histogram normalized
        assert r.n_bytes > 0 and r.media_type in ("image/jpeg", "audio/wav", "video/mp4")
    # deterministic
    again = {r.doc_id: r.features for r in mm.extract_media_features(media).collect()}
    assert {r.doc_id: r.features for r in rows} == again


def test_frame_sample_plan(spark):
    media = mm.synth_media(spark, 30)
    plan = mm.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    # ONLY video rows get frames (synth_media: doc_id % 3 == 2 → video/mp4);
    # image/audio rows must not be frame-sampled
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_ts_ms)
    assert set(by_doc) == {i for i in range(30) if i % 3 == 2}
    for ts_list in by_doc.values():
        ts_list.sort()
        assert ts_list[0] == 0
        assert all(b - a == 1000 for a, b in zip(ts_list, ts_list[1:]))


def test_decode_audio_stub_contract(spark):
    import numpy as np
    import pytest

    from gbif_data_validator_spark.operators.multimodal import decode_audio

    with pytest.raises(NotImplementedError):
        decode_audio(b"riff....")
    w = decode_audio(b"\x00\x7f\xff" * 10, fake=True)
    assert w.dtype == np.float32 and w.ndim == 1
    assert float(w.min()) >= -1.0 and float(w.max()) <= 1.0
    assert np.array_equal(w, decode_audio(b"\x00\x7f\xff" * 10, fake=True))


def test_resize_images_plumbing(spark):
    """Resize pass: image rows come back with the target dims + raw payload
    of exactly w*h*3 bytes; non-image rows pass through byte-identical."""
    from gbif_data_validator_spark.operators.multimodal import (
        resize_images,
        synth_media,
    )

    media = synth_media(spark, 60)
    out = resize_images(media, width=2, height=3)
    # same column names/types (nullability differs: literals vs mapInPandas)
    assert out.schema.simpleString() == media.schema.simpleString()
    rows = {r.doc_id: r for r in out.collect()}
    src = {r.doc_id: r for r in media.collect()}
    assert len(rows) == 60
    for i, r in rows.items():
        if src[i].meta.media_type == "image/jpeg":
            assert (r.meta.width, r.meta.height) == (2, 3)
            assert r.meta.media_type == "image/raw-rgb"
            assert len(r.media) == 2 * 3 * 3
        else:
            assert bytes(r.media) == bytes(src[i].media)
            assert r.meta == src[i].meta
