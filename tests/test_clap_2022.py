"""msclap-2022 tower parity (round-4 VERDICT #1).

The reference supports every `microsoft/clap/<version>` msclap ships
(/root/reference/src/feature/microsoft_clap.py:20-58). The 2022 weights
pair a bert-base-uncased caption encoder (bidirectional, token-type
embeddings, CLS pooling of the raw last hidden state) with a PANNs Cnn14
audio encoder — totally different layouts from 2023's GPT2 + HTSAT.
These tests pin the Flax towers against torch layer-for-layer:

- BertCaptionEncoder vs transformers.BertModel (random tiny config,
  converted through convert_bert_caption_tower);
- Cnn14Encoder vs an in-test torch CNN14 reference with live BatchNorm
  running stats (exercises the inference-mode BN folding);
- BertCaptionTokenizer vs transformers.BertTokenizer piece-for-piece on
  a tiny WordPiece vocab (lowercase, accents, punctuation, ##-pieces,
  [UNK], truncation, padding);
- the full 2022 CLAP forward end-to-end on random weights.
"""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")


def _tiny_text_cfg():
    from wise_tpu.models.clap.model import get_clap_config

    return dataclasses.replace(
        get_clap_config("2022"),
        vocab_size=97, text_width=32, text_heads=4, text_layers=2,
        text_max_positions=64, context_length=16, dtype=jnp.float32,
    )


def test_bert_caption_tower_torch_parity():
    transformers = pytest.importorskip("transformers")
    from wise_tpu.models.clap.convert import convert_bert_caption_tower
    from wise_tpu.models.clap.model import BertCaptionEncoder

    cfg = _tiny_text_cfg()
    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.text_width,
        num_hidden_layers=cfg.text_layers,
        num_attention_heads=cfg.text_heads,
        intermediate_size=4 * cfg.text_width,
        max_position_embeddings=cfg.text_max_positions,
        type_vocab_size=cfg.text_type_vocab,
        layer_norm_eps=cfg.text_ln_eps, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    ref = transformers.BertModel(hf_cfg, add_pooling_layer=True).eval()

    rng = np.random.default_rng(1)
    lengths = np.array([16, 9, 12], np.int32)
    tokens = np.zeros((3, cfg.context_length), np.int64)
    for r, n in enumerate(lengths):
        tokens[r, :n] = rng.integers(5, cfg.vocab_size, size=n)
    mask = (np.arange(cfg.context_length)[None] < lengths[:, None])

    with torch.no_grad():
        out = ref(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        )
    want = out.last_hidden_state[:, 0].numpy()  # msclap pools raw CLS

    sd = {"caption_encoder.base." + k: v.numpy()
          for k, v in ref.state_dict().items()}
    params = convert_bert_caption_tower(sd, cfg)
    got = BertCaptionEncoder(cfg).apply(
        {"params": params}, jnp.asarray(tokens.astype(np.int32)),
        jnp.asarray(lengths),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


class _TorchConvBlock(torch.nn.Module):
    """PANNs ConvBlock (conv3x3 no-bias -> BN -> relu, twice, then a
    2x2 avg-pool applied by the caller)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        return torch.nn.functional.avg_pool2d(x, 2)


class _TorchCnn14(torch.nn.Module):
    """PANNs Cnn14 from bn0 onward (the latent path msclap executes)."""

    def __init__(self, channels, mel_bins):
        super().__init__()
        self.bn0 = torch.nn.BatchNorm2d(mel_bins)
        cin = 1
        for i, ch in enumerate(channels):
            setattr(self, f"conv_block{i + 1}", _TorchConvBlock(cin, ch))
            cin = ch
        self.n_blocks = len(channels)
        self.fc1 = torch.nn.Linear(channels[-1], channels[-1])

    def forward(self, mel):  # (B, T, F)
        x = mel[:, None]          # (B, 1, T, F)
        x = x.transpose(1, 3)
        x = self.bn0(x)           # BN over mel bins
        x = x.transpose(1, 3)
        for i in range(self.n_blocks):
            x = getattr(self, f"conv_block{i + 1}")(x)
        x = torch.mean(x, dim=3)                        # over mel bins
        x = torch.amax(x, dim=2) + torch.mean(x, dim=2)  # over time
        return torch.relu(self.fc1(x))


def test_cnn14_audio_tower_torch_parity():
    from wise_tpu.models.clap.convert import convert_cnn14_audio_tower
    from wise_tpu.models.clap.model import Cnn14Encoder, get_clap_config

    channels, mel_bins = (4, 8), 16
    cfg = dataclasses.replace(
        get_clap_config("2022"), cnn14_channels=channels, n_mels=mel_bins,
        dtype=jnp.float32,
    )
    torch.manual_seed(0)
    ref = _TorchCnn14(channels, mel_bins)
    # live (non-identity) BatchNorm running stats so the folding is real
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0.0, 0.2)
    ref.eval()

    mel = np.random.default_rng(2).normal(
        size=(2, 64, mel_bins)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(mel)).numpy()

    sd = {"audio_encoder.base." + k: v.numpy()
          for k, v in ref.state_dict().items()}
    params = convert_cnn14_audio_tower(sd, cfg)
    got = Cnn14Encoder(cfg).apply({"params": params}, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


TINY_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "dog", "##s", "bark", "##ing", "cat", "a", "sound", "of",
    "cafe", "rain", ",", "!", ".", "'",
]


def test_bert_tokenizer_matches_transformers(tmp_path):
    transformers = pytest.importorskip("transformers")
    from wise_tpu.models.clap.tokenizer import BertCaptionTokenizer

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(TINY_VOCAB) + "\n")
    ours = BertCaptionTokenizer(vocab, context_length=10)
    ref = transformers.BertTokenizer(str(vocab), do_lower_case=True)

    texts = [
        "the dogs barking",
        "a Café sound, of rain!",   # accents + case + punctuation
        "unknownword barking cats",  # [UNK] + ##-pieces
        "the dog " * 20,             # truncation
        "",
    ]
    got_tokens, got_lengths = ours(texts)
    for r, t in enumerate(texts):
        enc = ref(t, max_length=10, padding="max_length", truncation=True)
        assert got_tokens[r].tolist() == enc["input_ids"], t
        assert got_lengths[r] == sum(enc["attention_mask"]), t


def test_clap_2022_end_to_end_random_weights():
    """The full 2022 model (CNN14 + BERT + projections) initialises,
    encodes, and L2-normalises on tiny shapes."""
    from wise_tpu.models.clap.model import CLAP, get_clap_config

    cfg = dataclasses.replace(
        _tiny_text_cfg(), cnn14_channels=(4, 8), n_mels=16, joint_dim=24,
    )
    model = CLAP(cfg)
    mel = jnp.zeros((2, 64, cfg.n_mels), jnp.float32)
    tokens = jnp.zeros((2, cfg.context_length), jnp.int32)
    lengths = jnp.array([5, 7], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), mel, tokens, lengths)
    a, t, scale = model.apply(params, mel, tokens, lengths)
    assert a.shape == (2, cfg.joint_dim) and t.shape == (2, cfg.joint_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(a), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(t), axis=-1), 1.0, atol=1e-5)


def test_bert_pad_length_invariance():
    """Bidirectional attention over the additive pad mask: embeddings
    must not depend on how much [PAD] follows [SEP] (this is what makes
    context_length a packing choice, not a math choice)."""
    from wise_tpu.models.clap.model import BertCaptionEncoder

    cfg = _tiny_text_cfg()
    enc = BertCaptionEncoder(cfg)
    rng = np.random.default_rng(3)
    ids = rng.integers(5, cfg.vocab_size, size=6)
    short = np.zeros((1, 8), np.int32)
    short[0, :6] = ids
    long_ = np.zeros((1, cfg.context_length), np.int32)
    long_[0, :6] = ids
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(long_),
                      jnp.asarray([6], jnp.int32))
    a = enc.apply(params, jnp.asarray(short), jnp.asarray([6], jnp.int32))
    b = enc.apply(params, jnp.asarray(long_), jnp.asarray([6], jnp.int32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_clap_2022_extractor_end_to_end(monkeypatch, tmp_path):
    """The full 2022 extractor path through the factory id: 48 kHz wav ->
    device resample to 44.1 kHz -> log-mel -> CNN14 -> projection, and
    text -> (hash-fallback) WordPiece slot -> BERT tower -> projection;
    tiny config swapped in so it runs on CPU in seconds."""
    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(tmp_path))
    monkeypatch.setenv("WISE_CLAP_DTYPE", "float32")
    from wise_tpu.models.clap import model as clap_model

    tiny = dataclasses.replace(
        clap_model.get_clap_config("2022"),
        joint_dim=16, duration=1.0, n_mels=16, cnn14_channels=(4, 8),
        vocab_size=64, context_length=8, text_width=16, text_heads=2,
        text_layers=1, text_max_positions=16,
    )
    monkeypatch.setitem(clap_model.CLAP_CONFIGS, "2022", tiny)
    from wise_tpu.models.clap.extractor import ClapExtractor

    fe = ClapExtractor("microsoft/clap/2022/2022")
    assert fe.config.audio_encoder_type == "cnn14"
    assert fe.config.text_encoder_type == "bert"
    wav = np.sin(
        2 * np.pi * 330 * np.arange(48_000 * 2) / 48_000
    ).astype(np.float32)
    feats = fe.extract_audio_features(fe.preprocess_audio(wav))
    assert feats.shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0,
                               rtol=1e-4)
    txt = fe.extract_text_features(["dog barking", "violin"])
    assert txt.shape == (2, 16)
    assert not np.allclose(txt[0], txt[1])
    np.testing.assert_allclose(np.linalg.norm(txt, axis=1), 1.0, rtol=1e-4)
