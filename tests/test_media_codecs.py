"""Real (no-external-lib) media decoders + the mapInPandas feature
extraction wired to them."""

import numpy as np
import pytest

from polyminhash_spark.operators.media_codecs import (
    audio_envelope_feature,
    decode_netpbm,
    decode_wav,
    encode_pgm,
    encode_ppm,
    encode_wav,
    image_grid_feature,
    real_decode_feature,
)


def test_netpbm_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
    assert np.array_equal(decode_netpbm(encode_pgm(gray)), gray)
    rgb = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_netpbm(encode_ppm(rgb)), rgb)


def test_netpbm_header_comments():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = b"P5\n# a comment\n4 3\n# another\n255\n" + gray.tobytes()
    assert np.array_equal(decode_netpbm(raw), gray)


def test_wav_roundtrip_mono_and_stereo():
    t = np.linspace(0, 1, 800, dtype=np.float32)
    mono = 0.5 * np.sin(2 * np.pi * 5 * t)
    got, rate = decode_wav(encode_wav(mono, rate=8000))
    assert rate == 8000 and got.shape == (800, 1)
    assert np.allclose(got[:, 0], mono, atol=1e-3)
    stereo = np.stack([mono, -mono], axis=1)
    got2, _ = decode_wav(encode_wav(stereo))
    assert got2.shape == (800, 2)
    assert np.allclose(got2, stereo, atol=1e-3)


def test_image_grid_feature_properties():
    flat = np.full((32, 32), 128, dtype=np.uint8)
    f = image_grid_feature(flat)
    assert f.shape == (16,)
    assert np.allclose(f, 128 / 255.0)
    # resize invariance: same image at 2x resolution -> same sketch
    big = np.kron(np.arange(16, dtype=np.uint8).reshape(4, 4) * 16,
                  np.ones((8, 8), dtype=np.uint8))
    assert np.allclose(image_grid_feature(big),
                       image_grid_feature(np.kron(
                           np.arange(16, dtype=np.uint8).reshape(4, 4) * 16,
                           np.ones((16, 16), dtype=np.uint8))), atol=1e-6)


def test_audio_envelope_feature():
    loud = np.ones(1600, dtype=np.float32) * 0.5
    quiet = np.zeros(1600, dtype=np.float32)
    f = audio_envelope_feature(np.concatenate([loud, quiet]))
    assert f.shape == (16,)
    assert np.allclose(f[:8], 0.5, atol=1e-6) and np.allclose(f[8:], 0.0)


def test_dispatch_honest_boundary():
    with pytest.raises(NotImplementedError, match="plug in here"):
        real_decode_feature(b"\xff\xd8\xff", "image/jpeg")


def test_extract_features_real_decoder_spark(spark):
    """End-to-end: decoder='real' through the mapInPandas plumbing on
    mixed wav + ppm payloads; features match the local kernels."""
    from polyminhash_spark.operators.multimodal import extract_features

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    t = np.linspace(0, 1, 400, dtype=np.float32)
    snd = (0.3 * np.sin(2 * np.pi * 11 * t)).astype(np.float32)
    rows = [
        ("img1", "image", "image/x-portable-pixmap",
         bytearray(encode_ppm(img)), 30, 20, None),
        ("aud1", "audio", "audio/wav",
         bytearray(encode_wav(snd)), None, None, 50),
    ]
    from polyminhash_spark.operators.multimodal import MEDIA_SCHEMA
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: np.array(r.feature, dtype=np.float32)
           for r in extract_features(media, decoder="real").collect()}
    assert np.allclose(got["img1"], image_grid_feature(img), atol=1e-6)
    samples, _ = decode_wav(encode_wav(snd))
    assert np.allclose(got["aud1"], audio_envelope_feature(samples), atol=1e-6)
