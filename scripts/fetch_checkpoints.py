#!/usr/bin/env python
"""Fetch + convert published model weights into the wise-tpu checkpoint
layout (run on a machine WITH network access; the dev sandbox has none).

    python scripts/fetch_checkpoints.py openclip ViT-B-32 laion2b_s34b_b79k
    python scripts/fetch_checkpoints.py clap 2023

Places results under $WISE_CHECKPOINT_DIR (default
~/.cache/wise_tpu/checkpoints):

    <model>/<pretrained>/open_clip_model.npz      (torch-keyed arrays)
    <model>/<pretrained>/bpe_simple_vocab_16e6.txt.gz
    clap/<version>/<variant>/clap_weights.npz

The runtime (wise_tpu.models.clip.extractor) then converts the torch-named
arrays into Flax parameters on load — no torch needed at serve time.
"""

import os
import sys
import urllib.request
from pathlib import Path

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
        from wise_tpu.models.clip.convert import convert_checkpoint_file

        n = convert_checkpoint_file(pt, d / "open_clip_model.npz")
        pt.unlink()  # npz is the runtime format
        print(f"converted {n} tensors -> {d / 'open_clip_model.npz'}")
    elif kind == "clap":
        version = sys.argv[2]
        variant = sys.argv[3] if len(sys.argv) > 3 else "four-datasets"
        d = root() / "clap" / version / variant
        fetch(MSCLAP[version], d / f"CLAP_weights_{version}.pth")
        print(
            "note: CLAP torch->flax conversion (HTSAT + GPT2 mapping) is "
            "pending; the raw weights are staged for it."
        )
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
