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


def _ppm_bytes(w, h):
    import numpy as np
    img = (np.arange(w * h * 3, dtype=np.uint8)).reshape(h, w, 3)
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes(), img


def _bmp_bytes(w, h, top_down=False):
    """Hand-built uncompressed 24-bit BMP with padded rows."""
    import struct

    import numpy as np

    img = (np.arange(w * h * 3, dtype=np.uint8)).reshape(h, w, 3)
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = img[:, :, ::-1]
    order = bgr if top_down else bgr[::-1]
    rows[:, : w * 3] = order.reshape(h, w * 3)
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(data), 2835, 2835, 0, 0,
    )
    return header + dib + data, img


def _wav_bytes(samples16):
    import struct

    import numpy as np

    data = np.asarray(samples16, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_real_ppm_decode_roundtrip():
    import numpy as np

    from gbif_data_validator_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
        sniff_media,
    )

    raw, img = _ppm_bytes(5, 3)
    assert sniff_media(raw) == "ppm"
    got = decode_image(raw)
    assert got.shape == (3, 5, 3) and np.array_equal(got, img)
    # encode -> decode round-trips byte-exactly
    assert np.array_equal(decode_image(encode_ppm(got)), got)


def test_real_bmp_decode_bottom_up_and_top_down():
    import numpy as np

    from gbif_data_validator_spark.operators.multimodal import decode_image

    for td in (False, True):
        raw, img = _bmp_bytes(3, 2, top_down=td)
        got = decode_image(raw)
        assert got.shape == (2, 3, 3) and np.array_equal(got, img), td


def test_real_wav_decode_pcm16():
    import numpy as np

    from gbif_data_validator_spark.operators.multimodal import decode_audio

    raw = _wav_bytes([0, 16384, -32768, 32767])
    got = decode_audio(raw)
    assert np.allclose(got, [0.0, 0.5, -1.0, 32767 / 32768.0])


def test_compressed_codecs_still_stubbed():
    import pytest as _pytest

    from gbif_data_validator_spark.operators.multimodal import (
        decode_audio,
        decode_image,
    )

    jpeg_ish = b"\xff\xd8\xff" + b"x" * 100
    with _pytest.raises(NotImplementedError, match="PPM"):
        decode_image(jpeg_ish)
    with _pytest.raises(NotImplementedError, match="PCM"):
        decode_audio(jpeg_ish)
    assert decode_image(jpeg_ish, fake=True).shape == (4, 4, 3)


def test_resize_real_ppm_through_spark(spark):
    import numpy as np

    from gbif_data_validator_spark.operators.multimodal import (
        decode_image,
        resize_images,
    )

    raw, img = _ppm_bytes(6, 4)
    df = spark.createDataFrame(
        [(1, bytearray(raw), {"media_type": "image/x-portable-pixmap",
                              "width": 6, "height": 4, "duration_ms": None})],
        "doc_id long, media binary, "
        "meta struct<media_type:string,width:int,height:int,duration_ms:int>",
    )
    out = resize_images(df, width=3, height=2).collect()[0]
    assert out.meta.width == 3 and out.meta.media_type == "image/x-portable-pixmap"
    got = decode_image(bytes(out.media))
    ys = (np.arange(2) * 4 // 2).clip(0, 3)
    xs = (np.arange(3) * 6 // 3).clip(0, 5)
    assert np.array_equal(got, img[ys][:, xs])
