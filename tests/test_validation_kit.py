"""Hermetic dress rehearsal of the real-weight validation kit.

The kit (docs/Real-Weight-Validation.md) is the procedure a networked host
runs to prove retrieval parity with the reference: stage checkpoint ->
convert -> extract -> index -> search -> golden-CSV compare -> mAP. Until
round 4 its scripts were only import-checked, so the first networked run
could die on bitrot in the glue itself (round-4 VERDICT #6). This test
runs the ENTIRE glue — the same `scripts/eval/kinetics6_compare.py` and
`scripts/eval/retrieval_eval.py` entry points, driving the same
wise_tpu.cli mains — with synthetic stand-ins for every download:

- a random-weight torch checkpoint in the exact open_clip key layout
  (ViT-Test-Tiny config), converted through convert_checkpoint_file (the
  same call fetch_checkpoints.py makes) and staged where the extractor
  looks;
- synthetic class-labelled mp4s + a Kinetics-style metadata.csv;
- a golden CSV emitted by the first run (--emit-golden) and byte-compared
  by a second run (--golden-csv) — executing the comparison logic for
  real;
- EPIC-format segment/query/relevancy fixtures driving the mAP CLI.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.media_fixtures import make_video  # noqa: E402

torch = pytest.importorskip("torch")


def _synthetic_checkpoint(ckpt_root: Path):
    """Random-weight ViT-Test-Tiny in the published open_clip key layout,
    staged exactly like fetch_checkpoints.py stages a download."""
    from tests.test_convert_published_keysets import openclip_clip_keyset
    from wise_tpu.models.clip.convert import convert_checkpoint_file
    from wise_tpu.models.clip.model import get_clip_config

    cfg = get_clip_config("ViT-Test-Tiny")
    rng = np.random.default_rng(0)
    sd = {}
    for k, v in openclip_clip_keyset(cfg).items():
        shape, dt = np.shape(v), np.asarray(v).dtype
        if np.issubdtype(dt, np.floating):
            arr = rng.normal(0.0, 0.02, shape).astype(np.float32)
        else:
            arr = np.zeros(shape, dt)
        sd[k] = torch.tensor(arr)
    d = ckpt_root / "ViT-Test-Tiny" / "rehearsal"
    d.mkdir(parents=True)
    pt = d / "open_clip_model.pt"
    torch.save(sd, pt)
    n = convert_checkpoint_file(pt, d / "open_clip_model.npz")
    pt.unlink()  # npz is the runtime format (fetch_checkpoints.py parity)
    assert n == len(sd)
    return "mlfoundations/open_clip/ViT-Test-Tiny/rehearsal"


def _synthetic_kinetics(data: Path):
    classes = {"cooking": ("aaa", "bbb"), "driving": ("ccc", "ddd")}
    rows = ["metadata_id,filename,starttime,stoptime,metadata"]
    for cls, names in classes.items():
        (data / cls).mkdir(parents=True)
        for name in names:
            make_video(data / cls / f"{name}.mp4", seconds=3, fps=4)
            rows.append(
                f"Kinetics/6b/video_categories,{name}.mp4,0.0,3.0,{cls}"
            )
    (data / "metadata.csv").write_text("\n".join(rows) + "\n")
    return [n for names in classes.values() for n in names]


def test_validation_kit_e2e(tmp_path, monkeypatch):
    ckpts = tmp_path / "ckpts"
    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(ckpts))
    # conformance runs f32 (docs/Real-Weight-Validation.md known gaps)
    monkeypatch.setenv("WISE_CLIP_DTYPE", "float32")
    feature_id = _synthetic_checkpoint(ckpts)

    work = tmp_path / "k6"
    data = work / "Kinetics-6b"
    stems = _synthetic_kinetics(data)

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                           / "scripts" / "eval"))
    import kinetics6_compare

    golden = work / "golden.csv"
    rc = kinetics6_compare.main([
        "--workdir", str(work), "--video-feature-id", feature_id,
        "--emit-golden", str(golden),
    ])
    assert rc == 0
    assert golden.exists() and "cooking" in golden.read_text()

    # second run: same cached project, fresh search, REAL comparison
    rc = kinetics6_compare.main([
        "--workdir", str(work), "--video-feature-id", feature_id,
        "--golden-csv", str(golden),
    ])
    assert rc == 0

    # mAP leg: EPIC-format fixtures over the kit's own result.csv
    result_csv = work / "result.csv"
    assert result_csv.exists()
    seg_rows = ["narration_id,participant_id,video_id,narration_timestamp,"
                "start_timestamp,stop_timestamp,narration"]
    for i, stem in enumerate(stems):
        seg_rows.append(
            f"n{i},p1,{stem},00:00:00.0,00:00:00.0,00:00:03.0,clip {i}"
        )
    segments_csv = work / "segments.csv"
    segments_csv.write_text("\n".join(seg_rows) + "\n")
    queries_csv = work / "queries.csv"
    queries_csv.write_text(
        'query_id,query_text\n"""cooking"" in video",cooking\n'
    )
    import pandas as pd

    rel_pkl = work / "rel.pkl"
    pd.to_pickle(np.ones((len(stems), 1), np.float32), rel_pkl)

    import retrieval_eval

    m = retrieval_eval.main([
        "--epic-video-segments", str(segments_csv),
        "--relevancy-mat-file", str(rel_pkl),
        "--wise-query", str(queries_csv),
        "--wise-search-results", str(result_csv),
        "--iou-threshold", "0.1",
    ])
    assert np.isfinite(m) and 0.0 <= m <= 1.0
