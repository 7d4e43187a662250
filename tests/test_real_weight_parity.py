"""Real-checkpoint parity vs recorded open_clip reference embeddings.

scripts/fetch_checkpoints.py (run on a networked host) stages, per model:
  <model>/<pretrained>/open_clip_model.npz    converted weights
  <model>/<pretrained>/bpe_simple_vocab_16e6.txt.gz
  <model>/<pretrained>/parity_fixtures.npz    reference embeddings recorded
                                              from the ORIGINAL torch model

These tests consume whatever is staged under $WISE_CHECKPOINT_DIR and assert
the JAX towers + tokenizer + exact preprocessing reproduce the reference:
token ids exactly, embeddings by cosine, and image-text retrieval by rank
order (the contract from /root/reference/tests/test-kinetics-6.sh). Offline
containers skip them; they are the machine-checkable half of VERDICT round-1
item 1 ("prove real-weight retrieval parity").

Fixture schema (parity_fixtures.npz):
  images          (N, H, W, 3) uint8   deterministic synthetic frames
  texts           (M,) str
  tokens          (M, 77) int32        open_clip tokenizer output
  image_features  (N, D) float32       L2-normalised reference embeddings
  text_features   (M, D) float32
  model, pretrained, seed              metadata
"""

import os
from pathlib import Path

import numpy as np
import pytest


def _staged_models():
    root = Path(
        os.environ.get(
            "WISE_CHECKPOINT_DIR",
            str(Path.home() / ".cache" / "wise_tpu" / "checkpoints"),
        )
    )
    out = []
    if root.exists():
        for fx in sorted(root.glob("*/*/parity_fixtures.npz")):
            d = fx.parent
            if list(d.glob("open_clip_model.npz")):
                out.append((d.parent.name, d.name, fx))
    return out


STAGED = _staged_models()


def _extractor(model, pretrained, monkeypatch):
    monkeypatch.setenv("WISE_CLIP_DTYPE", "float32")  # tight parity
    monkeypatch.setenv("WISE_PREPROCESS", "exact")
    from wise_tpu.models.clip.extractor import OpenClipExtractor

    return OpenClipExtractor(
        f"mlfoundations/open_clip/{model}/{pretrained}"
    )


@pytest.mark.skipif(not STAGED, reason="no parity fixtures staged")
@pytest.mark.parametrize("model,pretrained,fx", STAGED)
def test_tokenizer_matches_open_clip(model, pretrained, fx, monkeypatch):
    ext = _extractor(model, pretrained, monkeypatch)
    data = np.load(fx, allow_pickle=False)
    ours = ext.tokenizer([str(t) for t in data["texts"]])
    np.testing.assert_array_equal(ours, data["tokens"])


@pytest.mark.skipif(not STAGED, reason="no parity fixtures staged")
@pytest.mark.parametrize("model,pretrained,fx", STAGED)
def test_embeddings_match_reference(model, pretrained, fx, monkeypatch):
    ext = _extractor(model, pretrained, monkeypatch)
    data = np.load(fx, allow_pickle=False)
    img = ext.extract_image_features(data["images"])
    txt = ext.extract_text_features([str(t) for t in data["texts"]])
    img_cos = np.sum(img * data["image_features"], axis=1)
    txt_cos = np.sum(txt * data["text_features"], axis=1)
    assert img_cos.min() > 0.995, img_cos
    assert txt_cos.min() > 0.995, txt_cos


@pytest.mark.skipif(not STAGED, reason="no parity fixtures staged")
@pytest.mark.parametrize("model,pretrained,fx", STAGED)
def test_retrieval_rank_order_matches(model, pretrained, fx, monkeypatch):
    """The north-star contract: per text query, the image ranking produced by
    our embeddings equals the reference's."""
    ext = _extractor(model, pretrained, monkeypatch)
    data = np.load(fx, allow_pickle=False)
    img = ext.extract_image_features(data["images"])
    txt = ext.extract_text_features([str(t) for t in data["texts"]])
    ref_rank = np.argsort(
        -(data["text_features"] @ data["image_features"].T), axis=1,
        kind="stable",
    )
    got_rank = np.argsort(-(txt @ img.T), axis=1, kind="stable")
    np.testing.assert_array_equal(got_rank, ref_rank)
