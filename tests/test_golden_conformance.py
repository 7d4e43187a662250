"""Golden conformance: full pipeline output locked against committed CSVs.

The reference's de-facto conformance suite byte-compares CLI search output
against embedded ground truth across three test modes
(tests/test-kinetics-6.sh:124-231: audiovisual+CSV, metadata + --not-in,
--queries-from). This is the hermetic equivalent on a fixed lossless
corpus (PNG images + PCM wavs + raw-BGR24 AVI files with PCM audio — no
lossy codec anywhere, so pixels and samples are bit-identical on every
platform) with the deterministic RandomFeatures extractor. Two pins:

- ``conformance_still.csv`` — images + wavs only. Runs everywhere (no
  native decoder needed): flat image/audio search, a metadata (FTS5)
  query, and ``--queries-from`` batch mode.
- ``conformance_av.csv`` — adds TWO lossless AV files (one multi-shot).
  Needs the native decoder (make -C wise_tpu/native). Pins merge0
  (adjacent-in-time), merge1 (cross-modal AND), ``--not-in`` subtraction,
  and the SAME video query under IndexIVFFlat (full probe == exact) and
  IndexIVFPQ (OPQ + exact rerank == exact) — locking in that the ANN
  modes byte-match IndexFlatIP on this corpus.

Regenerate (after an INTENTIONAL semantic change only):
    python tests/test_golden_conformance.py --regenerate
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

GOLDEN_STILL = Path(__file__).parent / "golden" / "conformance_still.csv"
GOLDEN_AV = Path(__file__).parent / "golden" / "conformance_av.csv"
FEATURE_ID = "wise/random_features/64/golden"


def build_still_corpus(d: Path):
    import wave

    import cv2

    d.mkdir(parents=True, exist_ok=True)
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


def build_av_corpus(d: Path):
    from tests.media_fixtures import make_av_lossless

    build_still_corpus(d)
    make_av_lossless(d / "blocks.avi")
    # multi-shot second file: 12 s, 2 s blocks, different content seed and
    # tone — merge0 must produce multiple distinct ranges per file
    make_av_lossless(d / "shots.avi", seconds=12, freq=660.0, seed=777)


def _extract_and_index(corpus: Path, proj: Path, index_types=("IndexFlatIP",)):
    from wise_tpu.cli.create_index import main as create_index_main
    from wise_tpu.pipeline import extract_features

    extract_features(
        [corpus], proj,
        image_feature_id=FEATURE_ID,
        video_feature_id=FEATURE_ID,
        audio_feature_id=FEATURE_ID,
        batch_size=4,
    )
    for it in index_types:
        create_index_main(
            ["--project-dir", str(proj), "--index-type", it, "--overwrite"]
        )


def _search_lines(proj: Path, out: Path, extra, drop_header=True) -> str:
    from wise_tpu.cli.search import main as search_main

    assert search_main([
        "--project-dir", str(proj),
        "--result-format", "csv",
        "--save-to-file", str(out),
    ] + extra) == 0
    text = out.read_text()
    return text.split("\n", 1)[1] if drop_header else text


def run_still_pipeline(tmp: Path) -> str:
    from wise_tpu.cli.metadata import main as metadata_main

    corpus = tmp / "corpus"
    build_still_corpus(corpus)
    proj = tmp / "proj"
    _extract_and_index(corpus, proj)

    # metadata (FTS5) index over an imported CSV — reference Test 2 shape
    ann = tmp / "ann.csv"
    ann.write_text(
        "uid,fname,caption\n"
        "m1,red.png,a crimson panel with speckles\n"
        "m2,green.png,a verdant panel with speckles\n"
        "m3,tone440.wav,a low sine tone\n"
    )
    assert metadata_main([
        "import", "--from-csv", str(ann), "--metadata-id", "G/ann/golden",
        "--col-metadata-id", "uid", "--col-filename", "{fname}",
        "--col-metadata", "caption",
        "--project-dir", str(proj),
    ]) == 0
    from wise_tpu.cli.create_index import main as create_index_main

    create_index_main(["--project-dir", str(proj)])

    out = tmp / "results.csv"
    lines = _search_lines(proj, out, [
        "--query", "a red surface", "--in", "image", "--topk", "3",
    ], drop_header=False)
    lines += _search_lines(proj, out, [
        "--query", "a pure tone", "--in", "audio", "--topk", "4",
    ])
    # FTS5 metadata query (reference Test 2)
    lines += _search_lines(proj, out, [
        "--query", "crimson", "--in", "metadata", "--topk", "3",
    ])
    # --queries-from batch mode (reference Test 3)
    qcsv = tmp / "queries.csv"
    qcsv.write_text(
        "query_id,query_text\nq1,a pure tone\nq2,white noise\n"
    )
    lines += _search_lines(proj, out, [
        "--queries-from", str(qcsv), "--in", "audio", "--topk", "2",
    ])
    return lines


def run_av_pipeline(tmp: Path) -> str:
    corpus = tmp / "corpus"
    build_av_corpus(corpus)
    proj = tmp / "proj"
    _extract_and_index(
        corpus, proj, ("IndexFlatIP", "IndexIVFFlat", "IndexIVFPQ")
    )

    out = tmp / "results.csv"
    # video-only: merge0 merges the identical 2 fps samples inside each
    # 2 s block into one time range; shots.avi contributes multiple shots
    lines = _search_lines(proj, out, [
        "--query", "colorful noise", "--in", "video", "--topk", "16",
    ], drop_header=False)
    # AV cross-modal AND: merge0 per modality + merge1 fused rows
    lines += _search_lines(proj, out, [
        "--query", "colorful noise", "--in", "video",
        "--query", "a pure tone", "--in", "audio", "--topk", "6",
    ])
    # subtraction: drop video hits whose segments overlap audio hits
    lines += _search_lines(proj, out, [
        "--query", "colorful noise", "--in", "video",
        "--query", "a pure tone", "--not-in", "audio", "--topk", "6",
    ])
    # ANN modes must byte-match the exact rows above: IVF-Flat probes all
    # cells at the default nprobe; IVF-PQ (OPQ) exact-reranks against the
    # flat sibling
    for itype in ("IndexIVFFlat", "IndexIVFPQ"):
        lines += _search_lines(proj, out, [
            "--index-type", itype,
            "--query", "colorful noise", "--in", "video", "--topk", "16",
        ])
    return lines


def _native_available():
    from wise_tpu.io import native_decoder

    return native_decoder.available()


def test_still_matches_committed_golden(tmp_path):
    """Hermetic everywhere — no native decoder, no video decode."""
    assert GOLDEN_STILL.exists(), (
        "golden file missing — run: python tests/test_golden_conformance.py "
        "--regenerate"
    )
    got = run_still_pipeline(tmp_path)
    assert got == GOLDEN_STILL.read_text(), (
        "still-pipeline output drifted from the committed golden. If the "
        "change is intentional, regenerate with --regenerate and commit."
    )


@pytest.mark.skipif(
    not _native_available(),
    reason="AV golden rows need the native decoder (make -C wise_tpu/native)",
)
def test_av_matches_committed_golden(tmp_path):
    assert GOLDEN_AV.exists(), (
        "golden file missing — run: python tests/test_golden_conformance.py "
        "--regenerate"
    )
    got = run_av_pipeline(tmp_path)
    assert got == GOLDEN_AV.read_text(), (
        "AV-pipeline output drifted from the committed golden. If the "
        "change is intentional, regenerate with --regenerate and commit."
    )


if __name__ == "__main__":
    if "--regenerate" in sys.argv:
        import tempfile

        for name, fn, dest in (
            ("still", run_still_pipeline, GOLDEN_STILL),
            ("av", run_av_pipeline, GOLDEN_AV),
        ):
            tmp = Path(tempfile.mkdtemp())
            text = fn(tmp)
            dest.parent.mkdir(parents=True, exist_ok=True)
            dest.write_text(text)
            print(f"wrote {dest}:\n{text}")
    else:
        print(__doc__)
