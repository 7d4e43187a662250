"""CLIP BPE tokenizer: cross-implementation validation.

The BPE engine (wise_tpu/models/clip/tokenizer.py) re-implements open_clip's
SimpleTokenizer (reference dependency of
/root/reference/src/feature/mlfoundation_openclip.py). These tests prove the
engine token-for-token against transformers' independent ``CLIPTokenizer``
implementation, built from the SAME merge list (the committed deterministic
mini fixture — or, when staged by scripts/fetch_checkpoints.py, the real
``bpe_simple_vocab_16e6.txt.gz``, giving real-vocab validation fully
offline).

Comparison scope note: open_clip cleans text with ftfy + double
html.unescape; HF-without-ftfy substitutes a BasicTokenizer that also does
NFC + CJK-spacing. The corpus below therefore sticks to inputs where the two
cleanup paths agree, which still exercises the byte encoder, the regex word
split, contractions, multi-step merges, and the </w> handling end to end.
"""

import gzip
import json
from pathlib import Path

import numpy as np
import pytest

from wise_tpu.models.clip.tokenizer import (
    BPETokenizer,
    HashTokenizer,
    bytes_to_unicode,
    find_bpe_vocab,
    get_tokenizer,
)

GOLDEN = Path(__file__).parent / "golden"
MINI_VOCAB = GOLDEN / "bpe_mini_vocab.txt.gz"

CORPUS = [
    "a photo of a cat",
    "This is the sound of RAIN",
    "children   singing\tsongs",          # whitespace runs
    "it's the photographer's favourite",  # contractions 's
    "don't can't won't they're we've i'll i'd i'm",
    "hello, world!!!",                    # punctuation runs
    "numbers 1 2 3 42 2024",              # digit-at-a-time tokens
    "abc123def",                          # letter/digit boundary
    "under_score and semi;colon",         # '_' is punctuation in CLIP's pat
    "héllo wörld café",                   # precomposed latin (NFC-stable)
    "a" * 300,                            # long unknown word, deep merges
    "the quick brown fox jumps over the lazy dog",
    "",                                   # empty
    "   ",                                # whitespace only
    "driving a car down the street while cooking food in the kitchen "
    "with music playing in the background and birds flying over the "
    "water near the beach under a cloudy sky " * 3,  # > context length
]


def _hf_tokenizer(bpe_path, tmp_path):
    """Build transformers' CLIPTokenizer from the same open_clip-format
    merge file (derive vocab.json exactly as open_clip does)."""
    transformers = pytest.importorskip("transformers")
    with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
        merges = f.read().split("\n")
    merges = merges[1 : 49152 - 256 - 2 + 1]
    merges = [m for m in merges if m]
    vocab = list(bytes_to_unicode().values())
    vocab = vocab + [v + "</w>" for v in vocab]
    vocab += ["".join(m.split()) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    (tmp_path / "vocab.json").write_text(
        json.dumps({v: i for i, v in enumerate(vocab)})
    )
    (tmp_path / "merges.txt").write_text(
        "#version: derived\n" + "\n".join(merges) + "\n"
    )
    return transformers.CLIPTokenizer(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    )


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hfclip")
    ours = BPETokenizer(MINI_VOCAB)
    theirs = _hf_tokenizer(MINI_VOCAB, tmp)
    return ours, theirs


def test_engine_matches_transformers_token_for_token(pair):
    ours, theirs = pair
    for text in CORPUS:
        expect = theirs.convert_tokens_to_ids(theirs.tokenize(text))
        got = ours.encode(text)
        assert got == expect, f"mismatch on {text!r}: {got} != {expect}"


def test_special_token_ids_match(pair):
    ours, theirs = pair
    assert ours.sot == theirs.convert_tokens_to_ids("<|startoftext|>")
    assert ours.eot == theirs.convert_tokens_to_ids("<|endoftext|>")
    assert ours.vocab_size == theirs.vocab_size


def test_call_pads_wraps_truncates(pair):
    ours, _ = pair
    out = ours(["a photo of a cat", ""])
    assert out.shape == (2, 77) and out.dtype == np.int32
    assert out[0, 0] == ours.sot
    n = len(ours.encode("a photo of a cat"))
    assert out[0, n + 1] == ours.eot and np.all(out[0, n + 2:] == 0)
    assert list(out[1, :2]) == [ours.sot, ours.eot]
    # truncation keeps EOT in the last slot
    long = ours([" ".join(["cat"] * 200)])
    assert long.shape == (1, 77) and long[0, -1] == ours.eot


def test_multistep_merges_and_cache(pair):
    ours, _ = pair
    first = ours.encode("photograph")
    assert first == ours.encode("photograph")  # cache path identical
    # a trained whole-word merge should encode as a single token
    assert len(ours.encode("the")) == 1


def test_unicode_bytes_roundtrip(pair):
    """Non-Latin text must flow through the UTF-8 byte encoder without KeyError
    (every byte has a vocab entry even with zero trained merges)."""
    ours, _ = pair
    for text in ("北京", "emoji 🙂 test", "çağrı"):
        ids = ours.encode(text)
        assert ids and all(0 <= i < ours.vocab_size for i in ids)


def test_get_tokenizer_prefers_staged_vocab(tmp_path, monkeypatch):
    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(tmp_path))
    import shutil

    shutil.copy(MINI_VOCAB, tmp_path / "bpe_simple_vocab_16e6.txt.gz")
    tok = get_tokenizer()
    assert isinstance(tok, BPETokenizer)
    assert find_bpe_vocab() == tmp_path / "bpe_simple_vocab_16e6.txt.gz"


def test_get_tokenizer_ignores_staged_vocab_for_other_vocab_sizes(
    tmp_path, monkeypatch
):
    """A root-staged CLIP BPE table (49408 tokens) must NOT serve towers
    with a different vocabulary (SigLIP 32000, tiny test configs): ids up
    to 49407 would silently clamp in a smaller embedding table."""
    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(tmp_path))
    import shutil

    shutil.copy(MINI_VOCAB, tmp_path / "bpe_simple_vocab_16e6.txt.gz")
    tok = get_tokenizer(vocab_size=32000)
    assert isinstance(tok, HashTokenizer)
    assert tok.vocab_size == 32000
    # explicit path still honoured regardless of vocab_size
    tok2 = get_tokenizer(
        bpe_path=tmp_path / "bpe_simple_vocab_16e6.txt.gz",
        vocab_size=32000,
    )
    assert isinstance(tok2, BPETokenizer)


def test_get_tokenizer_hash_fallback_warns(tmp_path, monkeypatch, caplog):
    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(tmp_path / "nope"))
    monkeypatch.setattr(Path, "home", staticmethod(lambda: tmp_path))
    with caplog.at_level("WARNING"):
        tok = get_tokenizer()
    assert isinstance(tok, HashTokenizer)
    assert any("HASH tokenizer" in r.message for r in caplog.records)


# ---------------------------------------------------------------------------
# real-vocab validation (runs automatically once fetch_checkpoints.py staged
# the MIT-licensed bpe_simple_vocab_16e6.txt.gz on a networked host)
# ---------------------------------------------------------------------------

REAL = find_bpe_vocab()


@pytest.mark.skipif(REAL is None, reason="real BPE vocab not staged")
def test_real_vocab_structure(tmp_path):
    tok = BPETokenizer(REAL)
    assert tok.vocab_size == 49408
    assert tok.sot == 49406 and tok.eot == 49407
    out = tok([""])
    assert list(out[0, :2]) == [49406, 49407]


@pytest.mark.skipif(REAL is None, reason="real BPE vocab not staged")
def test_real_vocab_matches_transformers(tmp_path):
    ours = BPETokenizer(REAL)
    theirs = _hf_tokenizer(REAL, tmp_path)
    for text in CORPUS:
        expect = theirs.convert_tokens_to_ids(theirs.tokenize(text))
        assert ours.encode(text) == expect, text
