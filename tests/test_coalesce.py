"""Cross-request query coalescing (api/coalesce.py).

The reference has no serving-side batching at all — every FastAPI request
runs its own batch-1 text embed + faiss search (routes.py:1395-1442). The
engine micro-batches both device choke points across concurrent requests;
these tests pin (a) the leader/follower protocol's correctness under
concurrency, (b) that batching actually emerges, and (c) that coalesced
responses are bit-identical to the uncoalesced path, including mixed
per-request k in one batch.
"""

import copy
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import pytest

from tests.media_fixtures import make_video
from wise_tpu.api.coalesce import Coalescer, bucket_k, pad_bucket
from wise_tpu.api.engine import SearchEngine
from wise_tpu.cli.create_index import main as create_index_main
from wise_tpu.data_models import MediaType
from wise_tpu.pipeline import extract_features


# ---------------------------------------------------------------------------
# Coalescer unit behaviour
# ---------------------------------------------------------------------------

def test_concurrent_correctness():
    co = Coalescer(lambda xs: [x * 2 for x in xs], max_batch=8)
    with ThreadPoolExecutor(16) as pool:
        results = list(pool.map(co.submit, range(64)))
    assert results == [x * 2 for x in range(64)]
    assert co.num_items == 64
    assert co.num_batches <= 64


def test_batching_emerges_under_a_slow_batch_fn():
    def slow(xs):
        time.sleep(0.05)
        return xs

    co = Coalescer(slow, max_batch=16)
    with ThreadPoolExecutor(16) as pool:
        list(pool.map(co.submit, range(32)))
    # 32 sequential dispatches would take 1.6 s; followers queue behind the
    # first leader's sleep, so far fewer batches run.
    assert co.num_batches < 32
    assert co.max_seen_batch > 1
    assert co.num_items == 32


def test_forced_single_batch_and_max_batch_cap():
    co = Coalescer(lambda xs: xs, max_batch=4)
    pool = ThreadPoolExecutor(6)
    co._exec.acquire()  # hold the device: submitters can only queue
    try:
        futs = [pool.submit(co.submit, i) for i in range(6)]
        for _ in range(200):
            if len(co._queue) == 6:
                break
            time.sleep(0.01)
        assert len(co._queue) == 6
    finally:
        co._exec.release()
    assert sorted(f.result() for f in futs) == list(range(6))
    pool.shutdown()
    # 6 queued items with cap 4 -> batches of 4 then 2
    assert co.num_batches == 2
    assert co.max_seen_batch == 4


def test_exception_propagates_to_every_waiter():
    def boom(xs):
        raise ValueError("bad batch")

    co = Coalescer(boom, max_batch=8)
    with ThreadPoolExecutor(4) as pool:
        futs = [pool.submit(co.submit, i) for i in range(4)]
        for f in futs:
            with pytest.raises(ValueError, match="bad batch"):
                f.result()


def test_result_count_mismatch_is_an_error():
    co = Coalescer(lambda xs: xs[:-1] if len(xs) > 0 else xs, max_batch=8)
    with pytest.raises(RuntimeError, match="results"):
        co.submit(1)


def test_two_phase_correctness():
    """finalize mode: run_batch dispatches a handle, each waiter realises
    its own row — results identical to the sync mode."""
    co = Coalescer(
        lambda xs: [x * 2 for x in xs],  # "handle" = realised list
        finalize=lambda handle, i, payload: handle[i] + payload,
        max_batch=8,
    )
    with ThreadPoolExecutor(16) as pool:
        results = list(pool.map(co.submit, range(64)))
    assert results == [x * 3 for x in range(64)]
    assert co.num_items == 64


def test_two_phase_finalize_does_not_hold_the_execution_lock():
    """The point of two-phase mode: a blocked finalize (e.g. a slow device
    readback) must not prevent the next batch from dispatching."""
    release = threading.Event()
    dispatched = []

    def run(xs):
        dispatched.append(list(xs))
        return xs

    def finalize(handle, i, payload):
        if payload == 0:
            assert release.wait(5), "never released"
        return handle[i]

    co = Coalescer(run, finalize=finalize, max_batch=8)
    pool = ThreadPoolExecutor(2)
    f0 = pool.submit(co.submit, 0)
    for _ in range(200):
        if dispatched:
            break
        time.sleep(0.01)
    assert dispatched == [[0]]
    # item 0's finalize is now blocked OUTSIDE _exec; item 1 must dispatch
    # and complete while it waits
    f1 = pool.submit(co.submit, 1)
    assert f1.result(timeout=5) == 1
    assert f0.done() is False
    release.set()
    assert f0.result(timeout=5) == 0
    pool.shutdown()


def test_two_phase_finalize_exception_hits_only_its_owner():
    def finalize(handle, i, payload):
        if payload == 3:
            raise ValueError("bad row")
        return handle[i]

    co = Coalescer(lambda xs: xs, finalize=finalize, max_batch=8)
    co._exec.acquire()  # force one batch
    pool = ThreadPoolExecutor(4)
    futs = [pool.submit(co.submit, i) for i in range(4)]
    for _ in range(200):
        if len(co._queue) == 4:
            break
        time.sleep(0.01)
    co._exec.release()
    assert futs[0].result(timeout=5) == 0
    with pytest.raises(ValueError, match="bad row"):
        futs[3].result(timeout=5)
    pool.shutdown()


def test_two_phase_dispatch_exception_propagates_to_every_waiter():
    def boom(xs):
        raise ValueError("bad dispatch")

    co = Coalescer(boom, finalize=lambda h, i, p: h[i], max_batch=8)
    with ThreadPoolExecutor(4) as pool:
        futs = [pool.submit(co.submit, i) for i in range(4)]
        for f in futs:
            with pytest.raises(ValueError, match="bad dispatch"):
                f.result()


def test_buckets():
    assert [pad_bucket(n, 16) for n in (1, 2, 3, 5, 16, 40)] == [
        1, 2, 4, 8, 16, 16,
    ]
    assert [bucket_k(k) for k in (1, 10, 11, 20, 44, 999, 1000, 5000)] == [
        10, 10, 20, 20, 50, 1000, 1000, 5000,
    ]


# ---------------------------------------------------------------------------
# Engine integration: coalesced == uncoalesced, batching visible in stats
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def project(tmp_path_factory):
    media = tmp_path_factory.mktemp("comedia")
    for i in range(3):
        make_video(media / f"v{i}.mp4", seconds=4, fps=10)
    pdir = tmp_path_factory.mktemp("coproj") / "proj"
    fid = "wise/random_features/32/coal"
    extract_features([media], pdir, image_feature_id=fid,
                     video_feature_id=fid, audio_feature_id=fid)
    create_index_main(["--project-dir", str(pdir)])
    return pdir


def _response_key(resp):
    r = resp.video_results
    return [
        (w.vector_id, round(float(w.distance), 6))
        for w in r.unmerged_windows
    ]


def test_engine_coalesced_matches_uncoalesced(project):
    on = SearchEngine(project)
    on.config = copy.deepcopy(on.config)
    on.config.serve.coalesce = True  # default-off (measured); opt in here
    off = SearchEngine(project)
    off.config = copy.deepcopy(off.config)
    off.config.serve.coalesce = False

    queries = [f"query {i % 5}" for i in range(12)]
    ends = [5 if i % 3 else 10 for i in range(12)]

    def run(engine, q, end):
        return _response_key(
            engine.similarity_search(
                "video", [{"val": q}], MediaType.VIDEO, end=end
            )
        )

    expected = [run(off, q, e) for q, e in zip(queries, ends)]

    # warm up (creates the coalescers), then force every request into the
    # queue by holding the device lock so one leader drains them together.
    run(on, "warmup", 5)
    # end=5 and end=10 both round to k-tier 10, so one queue serves all
    co = on._search_coalescers["video:k10"]
    pool = ThreadPoolExecutor(12)
    co._exec.acquire()
    try:
        futs = [
            pool.submit(run, on, q, e)
            for q, e in zip(queries, ends)
        ]
        for _ in range(1000):
            if len(co._queue) == 12:
                break
            time.sleep(0.01)
        assert len(co._queue) == 12
    finally:
        co._exec.release()
    got = [f.result() for f in futs]
    pool.shutdown()

    assert got == expected
    stats = on.coalesce_stats()
    # 12 queued with default cap 16 -> one mixed-k batch
    assert stats["search:video:k10"]["max_batch"] == 12
    assert stats["search:video:k10"]["items"] == 13  # warmup + 12
    assert stats["text:video"]["items"] == 13


def test_image_query_embed_coalesces(project):
    """Multipart image queries route their device embed through the
    coalescer too; results match the uncoalesced path."""
    import cv2
    import numpy as np

    rgb = np.random.default_rng(3).integers(
        0, 255, (40, 60, 3), np.uint8
    )
    png = cv2.imencode(".png", rgb[..., ::-1])[1].tobytes()
    items = [{"modality": "image", "val": png}]

    on = SearchEngine(project)
    on.config = copy.deepcopy(on.config)
    on.config.serve.coalesce = True
    off = SearchEngine(project)
    off.config = copy.deepcopy(off.config)
    off.config.serve.coalesce = False
    want = _response_key(
        off.similarity_search("video", items, MediaType.VIDEO, end=5)
    )
    got = _response_key(
        on.similarity_search("video", items, MediaType.VIDEO, end=5)
    )
    assert got == want
    assert any(k.startswith("image:video:") for k in on.coalesce_stats())


def test_tier_keyed_queues(project):
    """Different k-tiers use different queues, so a request's effective
    search k can never depend on its batch-mates (the approximate index
    paths size their candidate budgets from k — load-dependent k would
    mean load-dependent results)."""
    eng = SearchEngine(project)
    eng.config = copy.deepcopy(eng.config)
    eng.config.serve.coalesce = True
    eng.similarity_search("video", [{"val": "a"}], MediaType.VIDEO, end=5)
    eng.similarity_search("video", [{"val": "a"}], MediaType.VIDEO, end=15)
    keys = set(eng._search_coalescers)
    assert keys == {"video:k10", "video:k20"}


def test_engine_coalesce_off_runs_without_coalescers(project):
    eng = SearchEngine(project)  # off is the measured default
    resp = eng.similarity_search("video", [{"val": "hello"}],
                                 MediaType.VIDEO, end=5)
    assert resp.video_results is not None
    assert eng.coalesce_stats() == {}


def test_served_item_returns_while_lock_is_held():
    """Starvation regression (round-4 fix): a thread whose item was
    executed by ANOTHER leader must return without ever acquiring the
    execution lock. The original submit loop blocked in Lock.acquire()
    even after its event was set — under contention (pthread barging +
    one core) that starved unlucky requests for dozens of batch cycles
    (measured p95 1,077 ms vs p50 94 ms, BENCHMARKS.md)."""
    import threading
    import time

    from wise_tpu.api.coalesce import Coalescer

    co = Coalescer(lambda ps: [p * 2 for p in ps])
    assert co._exec.acquire(timeout=1)  # an active leader holds the lock
    try:
        results = []
        t = threading.Thread(target=lambda: results.append(co.submit(21)))
        t.start()
        # wait for the item to be queued, then publish it the way a
        # leader's _run_one_batch would
        item = None
        deadline = time.time() + 2.0
        while time.time() < deadline:
            with co._mu:
                if co._queue:
                    item = co._queue.popleft()
                    break
            time.sleep(0.001)
        assert item is not None, "item never reached the queue"
        item.result = 42
        item.event.set()
        # the old code would still be parked in _exec.acquire() here
        t.join(timeout=1.0)
        assert not t.is_alive(), "served thread stayed blocked on the lock"
        assert results == [42]
    finally:
        co._exec.release()
