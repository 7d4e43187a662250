"""GPT2 byte-level BPE caption tokenizer for the CLAP text tower.

The reference's CLAP extractor (src/feature/microsoft_clap.py:53-58) embeds
text queries through msclap, whose 2022/2023 checkpoints pair the caption
tower with the GPT2 tokenizer and these conventions (msclap CLAPWrapper):

- every caption gets ``' <|endoftext|>'`` appended, so the sequence always
  ends with the eot token the pooled representation reads;
- the tokenizer pads with ``'!'`` (GPT2 token id 0 — msclap registers it as
  pad_token) to ``text_len`` (= context_length 77) with truncation;
- the pooled position is ``attention_mask.sum() - 1`` — the last REAL
  token, which is what CaptionEncoder's ``lengths`` argument encodes
  (models/clap/model.py CaptionEncoder).

The byte-level BPE engine itself comes from ``transformers.GPT2Tokenizer``
instantiated from LOCAL ``vocab.json`` + ``merges.txt`` (no network);
scripts/fetch_checkpoints.py stages them next to the msclap checkpoint.
Without staged vocab files the extractor falls back to the deterministic
HashTokenizer (random-weight towers only — same caveat as CLIP).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def find_gpt2_vocab(
    ckpt_dir: Optional[Path] = None,
) -> Optional[Tuple[Path, Path]]:
    """Locate ``vocab.json`` + ``merges.txt`` in the staging spots: the
    model's checkpoint dir, then the $WISE_CHECKPOINT_DIR/clap root."""
    candidates = []
    if ckpt_dir is not None:
        candidates.append(Path(ckpt_dir))
    root = os.environ.get(
        "WISE_CHECKPOINT_DIR",
        str(Path.home() / ".cache" / "wise_tpu" / "checkpoints"),
    )
    candidates.append(Path(root) / "clap")
    candidates.append(Path(root))
    for d in candidates:
        v, m = d / "vocab.json", d / "merges.txt"
        if v.exists() and m.exists():
            return v, m
    return None


class Gpt2CaptionTokenizer:
    """msclap-convention GPT2 tokenization -> (tokens, lengths) arrays."""

    #: GPT2 token id of '!' — msclap's registered pad token
    PAD_ID = 0

    def __init__(self, vocab_file: Path, merges_file: Path,
                 context_length: int = 77):
        from transformers import GPT2Tokenizer

        self.tok = GPT2Tokenizer(
            vocab_file=str(vocab_file), merges_file=str(merges_file)
        )
        self.tok.add_special_tokens({"pad_token": "!"})
        self.context_length = context_length

    def __call__(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        enc = self.tok(
            [t + " <|endoftext|>" for t in texts],
            max_length=self.context_length,
            padding="max_length",
            truncation=True,
        )
        tokens = np.asarray(enc["input_ids"], dtype=np.int32)
        lengths = np.asarray(enc["attention_mask"], dtype=np.int32).sum(
            axis=1
        ).astype(np.int32)
        return tokens, lengths


def get_caption_tokenizer(ckpt_dir: Optional[Path], vocab_size: int,
                          context_length: int):
    """GPT2 BPE when vocab files are staged AND the tower has the GPT2
    vocabulary; deterministic hash fallback otherwise (mirrors
    models/clip/tokenizer.get_tokenizer)."""
    from ..clip.tokenizer import HashTokenizer

    GPT2_VOCAB = 50257
    found = find_gpt2_vocab(ckpt_dir)
    if found is not None and vocab_size == GPT2_VOCAB:
        try:
            return Gpt2CaptionTokenizer(*found, context_length)
        except Exception as e:  # malformed staging — fall back loudly
            logger.warning("GPT2 vocab at %s unusable (%s); hash fallback",
                           found[0].parent, e)
    elif found is None and vocab_size == GPT2_VOCAB:
        logger.warning(
            "GPT2 caption vocab (vocab.json + merges.txt) not staged — "
            "using the deterministic HASH tokenizer fallback. Audio text "
            "queries will NOT match real-checkpoint behaviour; stage with "
            "scripts/fetch_checkpoints.py or set WISE_CHECKPOINT_DIR."
        )
    return HashTokenizer(vocab_size=vocab_size, context_length=context_length)
