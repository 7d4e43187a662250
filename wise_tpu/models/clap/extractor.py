"""CLAP feature extractor (drop-in for the reference's MicrosoftClap,
src/feature/microsoft_clap.py:20-58): id ``microsoft/clap/<version>/<...>``,
mono-downmix + fixed-duration collate in preprocess_audio, L2-normalised
audio/caption embeddings.

The ingest pipeline decodes audio at 48 kHz (config contract); the extractor
resamples to the model's 44.1 kHz on device (linear interpolation inside the
jitted forward) and pads/tiles to the model's fixed duration, mirroring
msclap's read_audio behaviour. Without a converted checkpoint the towers
run with deterministic random weights (same caveat as the CLIP extractor).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.mel import log_mel_spectrogram
from ..feature_extractor import BucketPolicy, FeatureExtractor
from .model import CLAP, get_clap_config

logger = logging.getLogger(__name__)

PIPELINE_SAMPLE_RATE = 48_000


def _checkpoint_dir(version: str, variant: str) -> Path:
    root = os.environ.get(
        "WISE_CHECKPOINT_DIR",
        str(Path.home() / ".cache" / "wise_tpu" / "checkpoints"),
    )
    return Path(root) / "clap" / version / variant


class ClapExtractor(FeatureExtractor):
    supports_image = False

    def __init__(self, id: str):
        tok = id.split("/")
        if len(tok) != 4 or not id.startswith("microsoft/clap/"):
            raise ValueError(f"invalid clap extractor id {id}")
        self.id = id
        self.version, self.variant = tok[2], tok[3]
        self.config = get_clap_config(self.version)
        # bf16 activations by default (same rationale as the CLIP extractor);
        # override with WISE_CLAP_DTYPE=float32
        import dataclasses as _dc

        dtype_name = os.environ.get("WISE_CLAP_DTYPE", "bfloat16")
        self.config = _dc.replace(
            self.config,
            dtype=jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32,
            # caption tower: compute the last layer only at each caption's
            # pooled row (identical math — same flag/kill-switch as CLIP)
            pool_last_block=os.environ.get("WISE_POOL_LAST", "1") != "0",
        )
        self.output_dim = self.config.joint_dim
        c = self.config
        self.model = CLAP(c)
        self.target_samples = int(c.sample_rate * c.duration)

        ckpt_dir = _checkpoint_dir(self.version, self.variant)
        ckpt = None
        if ckpt_dir.exists():
            for pat in ("*.npz", "*.pth", "*.pt"):
                hits = sorted(ckpt_dir.glob(pat))
                if hits:
                    ckpt = hits[0]
                    break
        rng = jax.random.PRNGKey(0)
        # 64 dummy frames: HTSAT pads to spec_frames internally, and
        # CNN14's six 2x2 pools need >= 2^6 input frames to init
        dummy_mel = jnp.zeros((1, 64, c.n_mels), jnp.float32)
        dummy_tok = jnp.zeros((1, c.context_length), jnp.int32)
        if ckpt is not None and ckpt.suffix in (".pth", ".pt"):
            # msclap torch checkpoint (staged by scripts/fetch_checkpoints.py)
            import torch

            from .convert import convert_msclap_state_dict

            logger.info(f"converting msclap checkpoint {ckpt}")
            raw = torch.load(str(ckpt), map_location="cpu", weights_only=True)
            if isinstance(raw, dict) and "model" in raw:
                raw = raw["model"]
            sd = {
                k: (v.numpy() if hasattr(v, "numpy") else v)
                for k, v in raw.items()
            }
            self.params = {"params": convert_msclap_state_dict(sd, c)}
        elif ckpt is not None:
            logger.info(f"loading CLAP checkpoint {ckpt}")
            with np.load(ckpt, allow_pickle=True) as z:
                import flax

                self.params = flax.serialization.from_bytes(
                    self.model.init(rng, dummy_mel, dummy_tok, jnp.ones((1,), jnp.int32)),
                    z["params"].tobytes(),
                )
        else:
            logger.warning(
                f"no checkpoint for {id} under {ckpt_dir}; using random "
                "weights (pipeline runs, retrieval quality needs real weights)"
            )
            self.params = self.model.init(
                rng, dummy_mel, dummy_tok, jnp.ones((1,), jnp.int32)
            )

        from .tokenizer import get_caption_tokenizer

        # caption tokenizer per tower family (2023: GPT2 byte-level BPE
        # from vocab.json + merges.txt; 2022: BERT WordPiece from
        # vocab.txt); deterministic hash fallback when nothing is staged
        self.tokenizer = get_caption_tokenizer(
            ckpt_dir if ckpt_dir.exists() else None,
            vocab_size=c.vocab_size, context_length=c.context_length,
            kind=c.text_encoder_type,
        )

        in_rate = PIPELINE_SAMPLE_RATE

        from ...ops.resample import resample_linear

        @jax.jit
        def _encode_audio(params, wav_48k):
            # device-side linear resample 48k -> model rate
            n_in = wav_48k.shape[1]
            n_out = int(round(n_in * c.sample_rate / in_rate))
            x = resample_linear(wav_48k, n_out)
            # pad (tile) to the model's fixed duration
            if n_out < self.target_samples:
                reps = -(-self.target_samples // n_out)
                x = jnp.tile(x, (1, reps))[:, : self.target_samples]
            else:
                x = x[:, : self.target_samples]
            mel = log_mel_spectrogram(
                x, sr=c.sample_rate, n_fft=c.n_fft, hop_length=c.hop_length,
                n_mels=c.n_mels, fmin=c.fmin, fmax=c.fmax,
            )
            return self.model.apply(params, mel, method=CLAP.encode_audio)

        @jax.jit
        def _encode_text(params, tokens, lengths):
            return self.model.apply(
                params, tokens, lengths, method=CLAP.encode_text
            )

        self._encode_audio = _encode_audio
        self._encode_text = _encode_text
        self._audio_buckets = BucketPolicy((1, 4, 16, 64))
        self._text_buckets = BucketPolicy((1, 4, 16, 64))

    # ------------------------------------------------------------------
    def preprocess_audio(self, audio) -> np.ndarray:
        """audio: (T,), (C,T) or (B,T) float waveform(s) at 48 kHz. Multi-
        channel input is mono-downmixed (reference: microsoft_clap.py:33-40)."""
        a = np.asarray(audio, dtype=np.float32)
        if a.ndim == 1:
            a = a[None]
        return a

    def extract_audio_features_dispatch(self, preprocessed_audio: np.ndarray):
        """Device-dispatch half of ``extract_audio_features`` — returns the
        UNREALISED (n, D) embedding device array so the serving coalescer
        can overlap readbacks across request batches (api/engine.py)."""
        a = np.asarray(preprocessed_audio, dtype=np.float32)
        if a.ndim == 1:
            a = a[None]
        n = a.shape[0]
        m = self._audio_buckets.pick(n)
        if m != n:
            a = np.concatenate([a, np.zeros((m - n, a.shape[1]), np.float32)])
        out = self._encode_audio(self.params, jnp.asarray(a))
        return out[:n]

    def extract_audio_features(self, preprocessed_audio: np.ndarray) -> np.ndarray:
        return np.asarray(
            self.extract_audio_features_dispatch(preprocessed_audio),
            dtype=np.float32,
        )

    def extract_text_features_dispatch(self, text_query: List[str]):
        """Dispatch-only caption-tower embed (see audio variant above)."""
        enc = self.tokenizer(list(text_query))
        if isinstance(enc, tuple):
            # GPT2 path: lengths come from the attention mask (pad id 0 is
            # also a real token, '!', so counting nonzeros would miscount)
            tokens, lengths = enc
        else:
            tokens = enc
            lengths = (tokens != 0).sum(axis=1).astype(np.int32)
        n = tokens.shape[0]
        m = self._text_buckets.pick(n)
        if m != n:
            tokens = np.concatenate(
                [tokens, np.zeros((m - n, tokens.shape[1]), tokens.dtype)]
            )
            lengths = np.concatenate([lengths, np.ones(m - n, np.int32)])
        out = self._encode_text(
            self.params, jnp.asarray(tokens), jnp.asarray(lengths)
        )
        return out[:n]

    def extract_text_features(self, text_query: List[str]) -> np.ndarray:
        return np.asarray(
            self.extract_text_features_dispatch(text_query), dtype=np.float32
        )
