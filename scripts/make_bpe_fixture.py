#!/usr/bin/env python
"""Generate the deterministic mini BPE merge-table fixture
(tests/golden/bpe_mini_vocab.txt.gz, open_clip file format).

The real ``bpe_simple_vocab_16e6.txt.gz`` is trained on a private corpus and
cannot be reconstructed offline; this fixture exists so the *real* BPE encode
path (wise_tpu/models/clip/tokenizer.py BPETokenizer) is the tested path —
tests/test_tokenizer.py cross-validates it token-for-token against
transformers' independent CLIPTokenizer implementation built from the same
merge list. Training is the classic BPE procedure (count pairs over a word
frequency dict, merge the most frequent, repeat), fully deterministic.
"""

import collections
import gzip
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from wise_tpu.models.clip.tokenizer import bytes_to_unicode

CORPUS = """
a photo of a cat sitting on the mat the quick brown fox jumps over the lazy
dog this is the sound of rain falling on the roof people are cooking food in
the kitchen a man is driving a car down the street children singing songs in
a classroom the photo shows a large building with many windows a dog runs
through the grass birds flying over the water music playing in the background
someone frying vegetables in a pan the cat and the dog are playing together
a photograph of mountains under a cloudy sky the sound of waves crashing on
the beach this is a picture of a red apple on a wooden table numbers like 1
2 3 42 and 2024 appear with punctuation marks like commas periods and
exclamation points it's the photographer's favourite don't can't won't
they're we've i'll i'd i'm hello world searching for video and audio content
""".split()

NUM_MERGES = 512


def train_bpe(words, num_merges):
    byte_enc = bytes_to_unicode()
    vocab = collections.Counter()
    for w in words:
        enc = "".join(byte_enc[b] for b in w.lower().encode("utf-8"))
        vocab[tuple(enc[:-1]) + (enc[-1] + "</w>",)] += 1
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for word, freq in vocab.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += freq
        if not pairs:
            break
        # deterministic tie-break: highest count, then lexicographic
        best = max(sorted(pairs), key=lambda p: pairs[p])
        merges.append(best)
        first, second = best
        new_vocab = collections.Counter()
        for word, freq in vocab.items():
            out, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def main():
    merges = train_bpe(CORPUS, NUM_MERGES)
    out = Path(__file__).resolve().parents[1] / "tests" / "golden"
    out.mkdir(parents=True, exist_ok=True)
    path = out / "bpe_mini_vocab.txt.gz"
    lines = ["#version: mini-fixture (scripts/make_bpe_fixture.py)"]
    lines += [f"{a} {b}" for a, b in merges]
    # mtime=0 so the gz bytes are reproducible run-to-run
    with gzip.GzipFile(path, "wb", mtime=0) as f:
        f.write(("\n".join(lines) + "\n").encode("utf-8"))
    print(f"wrote {path} ({len(merges)} merges)")


if __name__ == "__main__":
    main()
