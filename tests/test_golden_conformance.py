"""Golden conformance: full pipeline output locked against a committed CSV.

The reference's de-facto conformance suite byte-compares CLI search output
against embedded ground truth (tests/test-kinetics-6.sh:124-142). This is
the hermetic equivalent: a fixed lossless corpus (PNG images + PCM wavs +
a raw-BGR24 AVI with PCM audio — no lossy codec anywhere, so pixels and
samples are bit-identical on every platform) runs extract -> index ->
search with the deterministic RandomFeatures extractor, and the CSV output
must equal tests/golden/conformance.csv exactly (filenames, timestamps,
and scores to 3 decimals).

The AV file puts the video decode path — 2 fps sampling, thumbnails, AV
segment alignment — plus merge0 (adjacent-in-time), merge1 (cross-modal
AND) and --not-in subtraction under the pin (VERDICT round-1 item 5).

Regenerate (after an INTENTIONAL semantic change only):
    python tests/test_golden_conformance.py --regenerate
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

GOLDEN = Path(__file__).parent / "golden" / "conformance.csv"
FEATURE_ID = "wise/random_features/64/golden"


def build_corpus(d: Path):
    import wave

    import cv2

    from tests.media_fixtures import make_av_lossless

    d.mkdir(parents=True, exist_ok=True)
    make_av_lossless(d / "blocks.avi")
    rng = np.random.default_rng(1234)
    for name, value in (("red.png", 200), ("green.png", 60), ("blue.png", 120)):
        img = np.zeros((40, 48, 3), np.uint8)
        img[:, :, {"red.png": 2, "green.png": 1, "blue.png": 0}[name]] = value
        img[::4, ::3] = rng.integers(0, 255, (10, 16, 3), dtype=np.uint8)
        assert cv2.imwrite(str(d / name), img)
    for name, freq in (("tone440.wav", 440.0), ("tone880.wav", 880.0)):
        t = np.arange(48000 * 6) / 48000
        sig = (0.4 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
        with wave.open(str(d / name), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(48000)
            w.writeframes(sig.tobytes())


def run_pipeline(tmp: Path) -> str:
    from wise_tpu.cli.create_index import main as create_index_main
    from wise_tpu.cli.search import main as search_main
    from wise_tpu.pipeline import extract_features

    corpus = tmp / "corpus"
    build_corpus(corpus)
    proj = tmp / "proj"
    extract_features(
        [corpus], proj,
        image_feature_id=FEATURE_ID,
        video_feature_id=FEATURE_ID,
        audio_feature_id=FEATURE_ID,
        batch_size=4,
    )
    create_index_main(["--project-dir", str(proj)])

    out = tmp / "results.csv"
    args = [
        "--project-dir", str(proj),
        "--query", "a red surface", "--in", "image",
        "--topk", "3",
        "--result-format", "csv",
        "--save-to-file", str(out),
    ]
    assert search_main(args) == 0
    lines = out.read_text()
    args2 = [
        "--project-dir", str(proj),
        "--query", "a pure tone", "--in", "audio",
        "--topk", "4",
        "--result-format", "csv",
        "--save-to-file", str(out),
    ]
    assert search_main(args2) == 0
    lines += out.read_text().split("\n", 1)[1]  # drop duplicate header

    def more(extra):
        assert search_main([
            "--project-dir", str(proj),
            "--result-format", "csv",
            "--save-to-file", str(out),
        ] + extra) == 0
        return out.read_text().split("\n", 1)[1]

    # video-only: merge0 merges the identical 2 fps samples inside each
    # 2 s block of blocks.avi into one time range
    lines += more(["--query", "colorful noise", "--in", "video",
                   "--topk", "6"])
    # AV cross-modal AND: merge0 per modality + merge1 fused rows
    lines += more(["--query", "colorful noise", "--in", "video",
                   "--query", "a pure tone", "--in", "audio",
                   "--topk", "6"])
    # subtraction: drop video hits whose segments overlap audio hits
    lines += more(["--query", "colorful noise", "--in", "video",
                   "--query", "a pure tone", "--not-in", "audio",
                   "--topk", "6"])
    return lines


def _native_available():
    from wise_tpu.io import native_decoder

    return native_decoder.available()


@pytest.mark.skipif(
    not _native_available(),
    reason="AV golden rows need the native decoder (make -C wise_tpu/native)",
)
def test_matches_committed_golden(tmp_path):
    assert GOLDEN.exists(), (
        "golden file missing — run: python tests/test_golden_conformance.py "
        "--regenerate"
    )
    got = run_pipeline(tmp_path)
    assert got == GOLDEN.read_text(), (
        "pipeline output drifted from the committed golden. If the change is "
        "intentional, regenerate with --regenerate and commit."
    )


if __name__ == "__main__":
    if "--regenerate" in sys.argv:
        import tempfile

        tmp = Path(tempfile.mkdtemp())
        text = run_pipeline(tmp)
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN.write_text(text)
        print(f"wrote {GOLDEN}:\n{text}")
    else:
        print(__doc__)
