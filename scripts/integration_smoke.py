#!/usr/bin/env python
"""Full-workflow integration smoke (the shape of the reference's
tests/test-kinetics-6.sh, on synthetic media so it runs anywhere):

extract-features -> metadata import -> create-index (Flat+IVF+PQ+FTS) ->
search (one-shot, AND fusion, --not-in, CSV batch) -> serve (REST: search,
media Range, storyboard, featured, report).

    python scripts/integration_smoke.py [--feature-id ID] [--keep DIR]
"""

import argparse
import json
import shutil
import sys
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--feature-id", default="wise/random_features/64/smoke",
                   help="use an mlfoundations/... id to exercise real towers")
    p.add_argument("--audio-feature-id", default=None,
                   help="defaults to --feature-id, or a random extractor when "
                        "--feature-id is image-only (CLIP)")
    p.add_argument("--keep", default=None, help="keep the project under DIR")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (JAX_PLATFORMS env is "
                        "overridden by the axon sitecustomize; only "
                        "jax.config.update before first device use works)")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    t_start = time.time()

    from media_fixtures import make_av, make_image, make_video, make_wav

    root = Path(args.keep or tempfile.mkdtemp())
    if args.keep and root.exists():
        # a stale kept project would resume (checksum skip) and report 0
        # NEW vectors — wipe the entries the smoke owns (never the whole
        # user-supplied dir, which may hold unrelated data)
        for name in ("media", "proj", "ann.csv", "queries.csv",
                     "results.csv"):
            p = root / name
            if p.is_dir():
                shutil.rmtree(p)
            elif p.exists():
                p.unlink()
    media = root / "media"
    media.mkdir(parents=True, exist_ok=True)
    make_video(media / "frying-vegetables.mp4", seconds=10, fps=10)
    make_video(media / "driving-car.mp4", seconds=10, fps=10)
    make_av(media / "singing.avi", seconds=8, fps=10, freq=440.0)
    make_wav(media / "rain.wav", seconds=8, rate=48000, freq=200.0)
    make_image(media / "sunset.png", value=200)
    print(f"[1/6] media fixtures: {time.time()-t_start:.1f}s")

    from wise_tpu.pipeline import extract_features

    proj = root / "proj"
    audio_id = args.audio_feature_id or args.feature_id
    if audio_id.startswith("mlfoundations/"):
        audio_id = "wise/random_features/1024/smoke"
    stats = extract_features(
        [media], proj, image_feature_id=args.feature_id,
        video_feature_id=args.feature_id, audio_feature_id=audio_id,
        num_workers=2,
    )
    assert stats.num_video_vectors > 0 and stats.num_audio_vectors > 0
    print(f"[2/6] extract: {stats.num_video_vectors}v/"
          f"{stats.num_audio_vectors}a/{stats.num_image_vectors}i vectors, "
          f"{time.time()-t_start:.1f}s")

    from wise_tpu.cli.metadata import main as metadata_main

    csv_file = root / "ann.csv"
    csv_file.write_text(
        "uid,vid,start,stop,narration\n"
        "u1,frying-vegetables,0.0,4.0,cooking vegetables in a pan\n"
        "u2,driving-car,2.0,8.0,driving on the highway\n"
    )
    assert metadata_main([
        "import", "--from-csv", str(csv_file), "--metadata-id", "S/ann/test",
        "--col-metadata-id", "uid", "--col-filename", "{vid}.mp4",
        "--col-starttime", "start", "--col-stoptime", "stop",
        "--col-metadata", "narration", "--project-dir", str(proj),
    ]) == 0
    print(f"[3/6] metadata import: {time.time()-t_start:.1f}s")

    from wise_tpu.cli.create_index import main as create_index_main

    for t in ("IndexFlatIP", "IndexIVFFlat", "IndexIVFPQ"):
        assert create_index_main(
            ["--project-dir", str(proj), "--index-type", t]
        ) == 0
    print(f"[4/6] indices built: {time.time()-t_start:.1f}s")

    from wise_tpu.cli.search import main as search_main

    out = root / "results.csv"
    assert search_main([
        "--project-dir", str(proj), "--query", "cooking", "--in", "video",
        "--query", "music", "--in", "audio", "--topk", "5",
        "--result-format", "csv", "--save-to-file", str(out),
    ]) == 0
    assert out.read_text().startswith("query,rank,filename")
    assert search_main([
        "--project-dir", str(proj), "--query", "cooking", "--in", "video",
        "--query", "cooking", "--not-in", "video", "--result-format", "csv",
        "--save-to-file", str(out),
    ]) == 0
    qcsv = root / "queries.csv"
    qcsv.write_text("qid,text\nQ1,frying\nQ2,rain\n")
    assert search_main([
        "--project-dir", str(proj), "--queries-from", str(qcsv),
        "--in", "video", "--result-format", "csv", "--save-to-file", str(out),
    ]) == 0
    assert search_main([
        "--project-dir", str(proj), "--query", "vegetables",
        "--in", "metadata", "--result-format", "csv",
        "--save-to-file", str(out),
    ]) == 0
    print(f"[5/6] search modes: {time.time()-t_start:.1f}s")

    from wise_tpu.api.server import create_server

    server = create_server(proj, hostname="127.0.0.1", port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}/proj"

    def get(url, **kw):
        with urllib.request.urlopen(url, timeout=120, **kw) as r:
            ct = r.headers.get("Content-Type", "")
            return r.status, (json.loads(r.read()) if "json" in ct else r.read())

    s, info = get(f"{base}/info")
    assert s == 200 and info["num_vectors"] > 0
    s, res = get(f"{base}/search?q=driving&end=5&thumbnails_to_send=5")
    assert s == 200 and res["video_results"]
    vid = res["video_results"]["unmerged_windows"][0]["media_id"]
    req = urllib.request.Request(
        f"{base}/media/{vid}", headers={"Range": "bytes=0-99"}
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 206
    s, sb = get(f"{base}/storyboard/{vid}")
    assert s == 200 and sb["tiles"]
    s, _ = get(f"{base}/featured?end=10")
    assert s == 200
    req = urllib.request.Request(
        f"{base}/report",
        data=json.dumps({"sourceURI": f"media/{vid}", "reasons": ["x"]}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 200
    server.shutdown()
    print(f"[6/6] REST: {time.time()-t_start:.1f}s")
    print(f"INTEGRATION SMOKE PASSED in {time.time()-t_start:.1f}s "
          f"({args.feature_id})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
