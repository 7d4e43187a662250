"""GPT2 caption tokenizer for CLAP (models/clap/tokenizer.py).

msclap conventions under test (reference: src/feature/microsoft_clap.py
embeds captions through msclap, whose CLAPWrapper appends ' <|endoftext|>',
pads with '!' (GPT2 id 0) to text_len, and pools at attention_mask.sum()-1):
the wrapper must emit (tokens, lengths) arrays that drive CaptionEncoder's
last-real-token pooling. Hermetic: a tiny byte-level vocab is built from
transformers' own bytes_to_unicode table, so no network and no staged
checkpoint is needed."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="module")
def tiny_gpt2_vocab(tmp_path_factory):
    transformers = pytest.importorskip("transformers")  # noqa: F841
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    d = tmp_path_factory.mktemp("gpt2vocab")
    vocab = {"!": 0}  # pad convention: '!' IS GPT2 token id 0
    for sym in bytes_to_unicode().values():
        vocab.setdefault(sym, len(vocab))
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return d


def test_tokens_lengths_and_eot(tiny_gpt2_vocab):
    from wise_tpu.models.clap.tokenizer import Gpt2CaptionTokenizer

    tok = Gpt2CaptionTokenizer(
        tiny_gpt2_vocab / "vocab.json", tiny_gpt2_vocab / "merges.txt",
        context_length=77,
    )
    tokens, lengths = tok(["dog barking", "rain"])
    assert tokens.shape == (2, 77) and tokens.dtype == np.int32
    assert lengths.shape == (2,) and lengths.dtype == np.int32
    eot = tok.tok.convert_tokens_to_ids("<|endoftext|>")
    for i in range(2):
        # appended ' <|endoftext|>' is the last REAL token — the pooled pos
        assert tokens[i, lengths[i] - 1] == eot
        # padding beyond the mask is '!' == id 0
        assert (tokens[i, lengths[i]:] == 0).all()
    assert lengths[0] > lengths[1]  # longer caption, more tokens


def test_truncation_caps_at_context_length(tiny_gpt2_vocab):
    from wise_tpu.models.clap.tokenizer import Gpt2CaptionTokenizer

    tok = Gpt2CaptionTokenizer(
        tiny_gpt2_vocab / "vocab.json", tiny_gpt2_vocab / "merges.txt",
        context_length=16,
    )
    tokens, lengths = tok(["a very long caption " * 20])
    assert tokens.shape == (1, 16)
    assert lengths[0] == 16


def test_factory_falls_back_without_vocab(monkeypatch, tmp_path):
    from wise_tpu.models.clap.tokenizer import get_caption_tokenizer
    from wise_tpu.models.clip.tokenizer import HashTokenizer

    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(tmp_path / "nothing"))
    tok = get_caption_tokenizer(None, vocab_size=50257, context_length=77)
    assert isinstance(tok, HashTokenizer)
    # non-GPT2 vocab sizes (tiny test configs) never try the BPE path
    tok = get_caption_tokenizer(None, vocab_size=512, context_length=8)
    assert isinstance(tok, HashTokenizer)
    assert tok.vocab_size == 512


def test_factory_picks_gpt2_from_staged_dir(monkeypatch, tiny_gpt2_vocab):
    from wise_tpu.models.clap.tokenizer import (
        Gpt2CaptionTokenizer,
        get_caption_tokenizer,
    )

    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(tiny_gpt2_vocab))
    tok = get_caption_tokenizer(
        tiny_gpt2_vocab, vocab_size=50257, context_length=77
    )
    assert isinstance(tok, Gpt2CaptionTokenizer)


def test_extractor_consumes_tuple_tokenizer(monkeypatch, tiny_gpt2_vocab):
    """The CLAP extractor must route (tokens, lengths) tokenizers through
    encode_text with mask-derived lengths (token id 0 is a real token,
    '!', on the GPT2 path). Uses the tiny random-weight config."""
    jax = pytest.importorskip("jax")  # noqa: F841
    from wise_tpu.models.clap import extractor as E
    from wise_tpu.models.clap.model import CLAP_CONFIGS, CLAPConfig

    tiny = CLAPConfig(
        joint_dim=16, spec_frames=64, freq_ratio=2, n_mels=32, patch_size=4,
        embed_dim=16, depths=(1, 1), num_heads=(2, 4), window_size=4,
        vocab_size=50257, context_length=16, text_width=32, text_heads=4,
        text_layers=1, duration=1.0,
    )
    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(tiny_gpt2_vocab))
    monkeypatch.setitem(CLAP_CONFIGS, "tiny", tiny)
    ex = E.ClapExtractor("microsoft/clap/tiny/test")
    from wise_tpu.models.clap.tokenizer import Gpt2CaptionTokenizer

    assert isinstance(ex.tokenizer, Gpt2CaptionTokenizer)
    out = ex.extract_text_features(["dog barking", "rain!"])
    assert out.shape == (2, 16)
    n = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)
