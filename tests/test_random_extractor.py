import numpy as np

from wise_tpu.models import FeatureExtractorFactory
from wise_tpu.models.random_features import RandomFeatures


def test_factory_routes():
    fe = FeatureExtractorFactory("wise/random_features/512/test")
    assert isinstance(fe, RandomFeatures)
    assert fe.output_dim == 512


def test_deterministic_and_normalised():
    fe = FeatureExtractorFactory("wise/random_features/64/test")
    img = np.arange(2 * 8 * 8 * 3, dtype=np.uint8).reshape(2, 8, 8, 3)
    f1 = fe.extract_image_features(fe.preprocess_image(img))
    f2 = fe.extract_image_features(fe.preprocess_image(img))
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(f1, axis=1), 1.0, rtol=1e-5)
    # distinct inputs -> distinct features
    assert not np.allclose(f1[0], f1[1])


def test_text_and_audio():
    fe = FeatureExtractorFactory("wise/random_features/32/test")
    t = fe.extract_text_features(["hello", "world", "hello"])
    np.testing.assert_array_equal(t[0], t[2])
    assert not np.allclose(t[0], t[1])

    wav = np.sin(np.linspace(0, 100, 48000)).astype(np.float32)
    a = fe.extract_audio_features(fe.preprocess_audio(wav))
    assert a.shape == (1, 32)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)


def test_label_changes_features():
    a = FeatureExtractorFactory("wise/random_features/32/a")
    b = FeatureExtractorFactory("wise/random_features/32/b")
    fa = a.extract_text_features(["x"])
    fb = b.extract_text_features(["x"])
    assert not np.allclose(fa, fb)
