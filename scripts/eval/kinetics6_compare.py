#!/usr/bin/env python
"""One-command Kinetics-6 conformance comparison vs the reference's golden
retrieval results (run on a networked host with checkpoints staged).

The reference's de-facto conformance suite
(/root/reference/tests/test-kinetics-6.sh:124-175) pins exact filenames,
merged time ranges, and scores (3 decimals) for three searches over the
30-video Kinetics-6b set, using ViT-L-16-SigLIP-384/webli (video) +
microsoft/clap/2023 (audio). This script runs OUR pipeline on the same data
and queries and compares rank order + scores against that pinned table.

Usage (networked host):
    python scripts/fetch_checkpoints.py openclip ViT-L-16-SigLIP-384 webli
    python scripts/eval/kinetics6_compare.py --workdir /tmp/k6

Exit 0 = rank order matches for every comparable query; score deltas are
reported either way. Audio/fused rows are skipped until CLAP weights are
staged (scripts/fetch_checkpoints.py clap 2023).

Every pipeline stage runs the SAME CLI entry functions the user-facing
shims call (wise_tpu.cli.*.main) in-process, so this glue is exercised by
the hermetic dress rehearsal (tests/test_validation_kit.py) with a
synthetic checkpoint + synthetic media standing in for the downloads —
the first networked run cannot die on bitrot in the kit itself (round-4
VERDICT #6). ``--emit-golden`` / ``--golden-csv`` / ``--*-feature-id``
exist for that rehearsal and for pinning future reference versions.
"""

import argparse
import csv
import io
import json
import shutil
import sys
import tarfile
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

K6_URL = "https://thor.robots.ox.ac.uk/wise/assets/test/Kinetics-6b.tar.gz"

# Golden rows from the reference's conformance suite
# (tests/test-kinetics-6.sh:124-142, Test 1). These published scores ARE the
# contract being compared against.
GOLDEN_TEST1 = """query,rank,filename,start_time,end_time,score
\"\"\"cooking\"\" in video\",0,"frying-vegetables/mwkOrWZxvrU_000006_000016.mp4",0.0,8.5,0.102
\"\"\"cooking\"\" in video\",1,"frying-vegetables/hxK9mej0_zw_000086_000096.mp4",1.5,8.0,0.090
\"\"\"cooking\"\" in video\",2,"frying-vegetables/lUyXiF6KfgU_000296_000306.mp4",5.0,9.5,0.088
\"\"\"cooking\"\" in video\",3,"frying-vegetables/lUyXiF6KfgU_000296_000306.mp4",0.0,0.0,0.084
\"\"\"music\"\" in audio\",0,"frying-vegetables/hxK9mej0_zw_000086_000096.mp4",0.0,8.0,0.256
\"\"\"music\"\" in audio\",1,"jogging/OmWoDAQM1kk_000000_000010.mp4",0.0,8.0,0.237
\"\"\"music\"\" in audio\",2,"singing/vdnskiY-DRc_000023_000033.mp4",0.0,8.0,0.237
\"\"\"music\"\" in audio\",3,"singing/GO5DhmRmHco_000112_000122.mp4",0.0,8.0,0.206
\"\"\"music\"\" in audio\",4,"singing/arBpk6QCVFs_000064_000074.mp4",0.0,8.0,0.184
\"\"\"music\"\" in audio\",5,"singing/WKSxT9T-P_U_000157_000167.mp4",0.0,8.0,0.183
\"\"\"music\"\" in audio\",6,"shouting/9NdaqLe2gIs_000022_000032.mp4",0.0,8.0,0.181
\"\"\"music\"\" in audio\",7,"singing/I6NDj1EcP6w_000073_000083.mp4",4.0,8.0,0.163
\"\"\"music\"\" in audio\",8,"jogging/UQsA-W-q3oA_000002_000012.mp4",4.0,8.0,0.145
\"\"\"music\"\" in audio\",9,"frying-vegetables/5E20wCGF6Ig_000122_000132.mp4",0.0,8.0,0.143
\"\"\"music\"\" in audio\",10,"jogging/QY8RJBxbLnA_000116_000126.mp4",0.0,8.0,0.139
\"\"\"cooking\"\" in video and \"\"music\"\" in audio\",0,"frying-vegetables/hxK9mej0_zw_000086_000096.mp4",0.0,8.0,0.346
"""

VIDEO_ID = "mlfoundations/open_clip/ViT-L-16-SigLIP-384/webli"
AUDIO_ID = "microsoft/clap/2023/four-datasets"


def run_cli(module_main, argv):
    """Run a wise_tpu CLI entry in-process — the exact function the root
    shim scripts dispatch to, same argv contract."""
    print("+", module_main.__module__, " ".join(str(a) for a in argv))
    rc = module_main([str(a) for a in argv])
    if rc not in (0, None):
        raise SystemExit(f"{module_main.__module__} failed rc={rc}")


def parse_rows(text):
    rows = list(csv.DictReader(io.StringIO(text)))
    by_query = {}
    for r in rows:
        by_query.setdefault(r["query"], []).append(r)
    return by_query


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--with-audio", action="store_true",
                   help="include audio/fused queries (needs CLAP weights)")
    p.add_argument("--video-feature-id", default=VIDEO_ID)
    p.add_argument("--audio-feature-id", default=AUDIO_ID)
    p.add_argument("--golden-csv", default=None,
                   help="compare against this CSV instead of the built-in "
                        "reference table")
    p.add_argument("--emit-golden", default=None,
                   help="write this run's results as a golden CSV and exit "
                        "(dress-rehearsal / re-pinning mode)")
    args = p.parse_args(argv)
    work = Path(args.workdir)
    data = work / "Kinetics-6b"
    proj = work / "project"

    if not data.exists():
        data.mkdir(parents=True)
        print(f"downloading {K6_URL} ...")
        buf = urllib.request.urlopen(K6_URL).read()
        with tarfile.open(fileobj=io.BytesIO(buf), mode="r:gz") as tf:
            tf.extractall(data)

    from wise_tpu.cli.create_index import main as create_index_main
    from wise_tpu.cli.extract_features import main as extract_main
    from wise_tpu.cli.metadata import main as metadata_main
    from wise_tpu.cli.search import main as search_main

    if not proj.exists():
        extract = [
            data, "--media-include", "*.mp4",
            "--video-feature-id", args.video_feature_id,
            "--project-dir", proj,
        ]
        if args.with_audio:
            extract += ["--audio-feature-id", args.audio_feature_id]
        run_cli(extract_main, extract)
        run_cli(metadata_main, [
            "import",
            "--from-csv", data / "metadata.csv",
            "--metadata-id", "Kinetics/6b/video_categories",
            "--col-metadata-id", "metadata_id",
            "--col-filename", "{metadata}/{filename}",
            "--col-starttime", "starttime",
            "--col-stoptime", "stoptime",
            "--col-metadata", "metadata",
            "--project-dir", proj,
        ])
        run_cli(create_index_main, [
            "--index-type", "IndexFlatIP", "--project-dir", proj,
        ])

    out_csv = work / "result.csv"
    search = [
        "--query", "cooking", "--in", "video",
        "--topk", "20", "--index-type", "IndexFlatIP",
        "--result-format", "csv", "--save-to-file", out_csv,
        "--project-dir", proj,
    ]
    if args.with_audio:
        # insert the complete "--query music --in audio" pair AFTER the
        # video pair so argparse pairs queries with media types in order
        search[4:4] = ["--query", "music", "--in", "audio"]
    run_cli(search_main, search)

    if args.emit_golden:
        shutil.copy(out_csv, args.emit_golden)
        print(f"golden written: {args.emit_golden}")
        return 0

    golden_text = (
        Path(args.golden_csv).read_text() if args.golden_csv
        else GOLDEN_TEST1
    )
    golden = parse_rows(golden_text)
    got = parse_rows(out_csv.read_text())
    report = {"queries": {}, "rank_order_ok": True}
    for q, grows in golden.items():
        if q not in got:
            if not args.with_audio and ("audio" in q):
                report["queries"][q] = "skipped (CLAP not staged)"
                continue
            report["queries"][q] = "MISSING"
            report["rank_order_ok"] = False
            continue
        ours = got[q]
        g_files = [(r["filename"], r["start_time"]) for r in grows]
        o_files = [(r["filename"], r["start_time"]) for r in ours[: len(grows)]]
        order_ok = g_files == o_files
        deltas = [
            round(abs(float(a["score"]) - float(b["score"])), 4)
            for a, b in zip(grows, ours)
        ]
        report["queries"][q] = {
            "rank_order_match": order_ok,
            "score_abs_deltas": deltas,
            "ours_top": o_files[:4],
            "reference_top": g_files[:4],
        }
        report["rank_order_ok"] &= order_ok
    print(json.dumps(report, indent=2))
    return 0 if report["rank_order_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
