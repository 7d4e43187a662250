#!/usr/bin/env python
"""Fetch + convert published model weights into the wise-tpu checkpoint
layout, and record reference-embedding parity fixtures (run on a machine
WITH network access; the dev sandbox has none).

    python scripts/fetch_checkpoints.py openclip ViT-B-32 laion2b_s34b_b79k
    python scripts/fetch_checkpoints.py clap 2023

Places results under $WISE_CHECKPOINT_DIR (default
~/.cache/wise_tpu/checkpoints):

    <model>/<pretrained>/open_clip_model.npz      (torch-keyed arrays)
    <model>/<pretrained>/bpe_simple_vocab_16e6.txt.gz
    bpe_simple_vocab_16e6.txt.gz                  (root copy, any model)
    <model>/<pretrained>/parity_fixtures.npz      (reference embeddings)
    clap/<version>/<variant>/clap_weights.npz

The runtime (wise_tpu.models.clip.extractor) converts the torch-named arrays
into Flax parameters on load — no torch needed at serve time.

Parity fixtures: if open_clip is importable, the ORIGINAL torch model is run
on a deterministic synthetic image set + text set and its L2-normalised
embeddings are recorded. tests/test_real_weight_parity.py then asserts the
JAX towers reproduce them (cosine + rank order) — the offline half of the
VERDICT round-1 "prove real-weight retrieval parity" loop; the online half
is the Kinetics-6 comparison (docs/Real-Weight-Validation.md).
"""

import os
import shutil
import sys
import urllib.request
from pathlib import Path

import numpy as np

HF_OPENCLIP = (
    "https://huggingface.co/laion/CLIP-{model}-{pretrained}"
    "/resolve/main/open_clip_pytorch_model.bin"
)
OPENCLIP_BPE = (
    "https://github.com/mlfoundations/open_clip/raw/main/src/open_clip"
    "/bpe_simple_vocab_16e6.txt.gz"
)
MSCLAP = {
    "2022": "https://huggingface.co/microsoft/msclap/resolve/main/CLAP_weights_2022.pth",
    "2023": "https://huggingface.co/microsoft/msclap/resolve/main/CLAP_weights_2023.pth",
}

#: msclap's caption tokenizer is stock GPT2 (vocab.json + merges.txt) for
#: the 2023 weights, bert-base-uncased WordPiece (vocab.txt) for 2022
GPT2_TOKENIZER_BASE = "https://huggingface.co/gpt2/resolve/main/"
BERT_TOKENIZER_BASE = (
    "https://huggingface.co/bert-base-uncased/resolve/main/"
)

# deterministic parity inputs: fixed seed images + the reference's own query
# prompts (src/index/feature_search_index.py:24-28) and Kinetics-6 classes
FIXTURE_SEED = 7
FIXTURE_IMAGES = 8
FIXTURE_TEXTS = [
    "This is a photo of a cooking",
    "This is a photo of a driving car",
    "This is a photo of a person singing",
    "this is the sound of music",
    "a diagram",
    "a photo of a cat",
    "the quick brown fox jumps over the lazy dog",
    "people frying vegetables in a kitchen",
]


def root() -> Path:
    return Path(
        os.environ.get(
            "WISE_CHECKPOINT_DIR",
            str(Path.home() / ".cache" / "wise_tpu" / "checkpoints"),
        )
    )


def fetch(url: str, dst: Path):
    dst.parent.mkdir(parents=True, exist_ok=True)
    if dst.exists():
        print(f"exists: {dst}")
        return
    print(f"fetching {url} -> {dst}")
    urllib.request.urlretrieve(url, dst)


def fixture_images(size=(288, 352)):
    """Deterministic synthetic frames (non-square, so the resize+crop path is
    exercised): smooth gradients + seeded noise, uint8 HWC."""
    rng = np.random.default_rng(FIXTURE_SEED)
    h, w = size
    yy, xx = np.mgrid[0:h, 0:w]
    imgs = []
    for i in range(FIXTURE_IMAGES):
        base = (
            127 + 60 * np.sin(xx / (9.0 + i) + i)
            + 50 * np.cos(yy / (13.0 + 2 * i))
        )
        noise = rng.normal(0, 22, (h, w, 3))
        img = np.clip(base[:, :, None] + noise, 0, 255).astype(np.uint8)
        imgs.append(img)
    return np.stack(imgs)


def record_openclip_fixtures(model: str, pretrained: str, dst: Path):
    """Run the ORIGINAL open_clip torch model on the fixture inputs and save
    its embeddings (requires `pip install open_clip_torch` on this host)."""
    try:
        import open_clip
        import torch
        from PIL import Image
    except ImportError as e:
        print(f"open_clip unavailable ({e}); skipping parity fixtures")
        return
    m, _, preprocess = open_clip.create_model_and_transforms(
        model, pretrained=pretrained, device="cpu"
    )
    m.eval()
    tokenizer = open_clip.get_tokenizer(model)
    imgs = fixture_images()
    with torch.no_grad():
        x = torch.stack(
            [preprocess(Image.fromarray(im)) for im in imgs]
        )
        img_feat = m.encode_image(x).float()
        img_feat /= img_feat.norm(dim=-1, keepdim=True)
        toks = tokenizer(FIXTURE_TEXTS)
        txt_feat = m.encode_text(toks).float()
        txt_feat /= txt_feat.norm(dim=-1, keepdim=True)
    np.savez(
        dst,
        images=imgs,
        texts=np.asarray(FIXTURE_TEXTS),
        tokens=toks.numpy().astype(np.int32),
        image_features=img_feat.numpy().astype(np.float32),
        text_features=txt_feat.numpy().astype(np.float32),
        model=model,
        pretrained=pretrained,
        seed=FIXTURE_SEED,
    )
    print(f"recorded parity fixtures -> {dst}")


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    kind = sys.argv[1]
    if kind == "openclip":
        model, pretrained = sys.argv[2], sys.argv[3]
        d = root() / model / pretrained
        pt = d / "open_clip_pytorch_model.bin"
        fetch(HF_OPENCLIP.format(model=model, pretrained=pretrained), pt)
        fetch(OPENCLIP_BPE, d / "bpe_simple_vocab_16e6.txt.gz")
        if not (root() / "bpe_simple_vocab_16e6.txt.gz").exists():
            shutil.copy(
                d / "bpe_simple_vocab_16e6.txt.gz",
                root() / "bpe_simple_vocab_16e6.txt.gz",
            )
        record_openclip_fixtures(model, pretrained, d / "parity_fixtures.npz")
        from wise_tpu.models.clip.convert import convert_checkpoint_file

        n = convert_checkpoint_file(pt, d / "open_clip_model.npz")
        pt.unlink()  # npz is the runtime format
        print(f"converted {n} tensors -> {d / 'open_clip_model.npz'}")
    elif kind == "clap":
        version = sys.argv[2]
        variant = sys.argv[3] if len(sys.argv) > 3 else "four-datasets"
        d = root() / "clap" / version / variant
        fetch(MSCLAP[version], d / f"CLAP_weights_{version}.pth")
        # caption tokenizer assets per tower family
        # (models/clap/tokenizer.py looks in the model dir, then clap/)
        if version == "2022":
            names = [(BERT_TOKENIZER_BASE + "vocab.txt", "vocab.txt")]
        else:
            names = [(GPT2_TOKENIZER_BASE + n, n)
                     for n in ("vocab.json", "merges.txt")]
        for url, name in names:
            fetch(url, d / name)
            if not (root() / "clap" / name).exists():
                import shutil

                shutil.copy(d / name, root() / "clap" / name)
        print(
            "staged msclap weights + caption tokenizer; the extractor "
            "converts the .pth to flax params at first load "
            "(models/clap/extractor.py + convert.py)."
        )
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
