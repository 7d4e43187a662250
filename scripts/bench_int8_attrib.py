#!/usr/bin/env python
"""int8 exact-path latency attribution at 1M x 512 (round-4 VERDICT #3).

BENCHMARKS.md's int8 row (1.04 ms p50 including exact rerank) never split
device candidate-scan cost from host rerank cost, and sits ~1.7x above the
int8 bandwidth floor (1M x 512 x 1 B / 866 GB/s ~= 0.59 ms). This measures
the two halves separately, best-of-3, 100-iteration data-dependent chains
(CLAUDE.md timing protocol for sub-ms figures):

- scan-only: int8_candidates (int8 MXU dot + rescale + block-max select),
  realised via a tiny readback;
- rerank-only: host gather of kc rows from the f32 matrix + f32 re-score
  (rerank_exact_f32), on realised candidate rows;
- end-to-end: the production _search_flat int8 sequence.

Quantization happens ON DEVICE here (same math as quantize_rows_int8) —
the tunnel's ~9 MB/s device_put makes host staging of a 2 GB matrix
impractical, and the timing target is the scan/rerank kernels, not the
one-time build.
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wise_tpu.ops.topk import int8_candidates, rerank_exact_f32  # noqa: E402

N, D, K, GROUP = 1_000_000, 512, 20, 4096
KC = 4 * K  # config.int8_rerank_mult default


def chain(fn, q0, iters):
    """Serial data-dependent chain: each iteration's query is perturbed by
    the previous output so XLA cannot parallelise/elide dispatches."""
    q = q0
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(q)
        q = q0 + 1e-12 * out[0][0, 0]
    np.asarray(out[0][0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    n_pad = ((N + GROUP - 1) // GROUP) * GROUP

    @jax.jit
    def build(key):
        db = jax.random.normal(key, (N, D), jnp.float32)
        db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
        scales = jnp.max(jnp.abs(db), axis=1) / 127.0
        codes = jnp.rint(db / scales[:, None]).astype(jnp.int8)
        codes = jnp.pad(codes, ((0, n_pad - N), (0, 0)))
        scales = jnp.pad(scales, (0, n_pad - N))
        return codes, scales

    codes, scales = build(key)
    np.asarray(scales[:1])
    q1 = jax.random.normal(jax.random.PRNGKey(1), (1, D), jnp.float32)
    q1 = q1 / jnp.linalg.norm(q1, axis=1, keepdims=True)

    # codes/scales MUST be jit ARGUMENTS: a closure-captured device array
    # is embedded as a constant in the compile payload, and this remote-
    # compile backend ships the payload over HTTP — a 512 MB codes matrix
    # gets HTTP 413 (observed as broken-pipe for ~30 min first).
    scan2 = jax.jit(
        lambda q, c, s: int8_candidates(q, c, s, n_valid=N, kc=KC, k=K,
                                        group=GROUP)
    )

    def scan(q):
        return scan2(q, codes, scales)

    _ = scan(q1)
    np.asarray(_[0][0, 0])

    scan_ms = min(chain(scan, q1, 100) for _ in range(3)) * 1e3
    floor_ms = (n_pad * D * 1 + n_pad * 4) / 866e9 * 1e3
    print(f"scan_only_ms={scan_ms:.3f}  int8_bw_floor_ms={floor_ms:.3f}  "
          f"ratio={scan_ms / floor_ms:.2f}x")

    # SAME-SESSION calibration: the bf16 and f32 exact scans have known
    # good-day numbers (1.19-1.44 / 2.2-2.7 ms, BENCHMARKS.md). Measuring
    # them in this process separates tunnel-session dispatch overhead
    # from real int8-kernel cost.
    from wise_tpu.ops.topk import two_stage_topk

    @jax.jit
    def debuild(c, s):
        return (c.astype(jnp.float32) * s[:, None]).astype(jnp.bfloat16)

    db_bf16 = debuild(codes, scales)
    np.asarray(db_bf16[0, :1])
    scan_bf16 = jax.jit(
        lambda q, d: two_stage_topk(q, d, n_valid=N, k=K, group=GROUP)
    )
    _ = scan_bf16(q1, db_bf16)
    np.asarray(_[0][0, 0])
    bf16_ms = min(
        chain(lambda q: scan_bf16(q, db_bf16), q1, 100) for _ in range(3)
    ) * 1e3
    print(f"bf16_scan_same_session_ms={bf16_ms:.3f} "
          f"(good-day reference 1.19-1.44)")
    # re-measure int8 interleaved after bf16 to bound drift
    scan_ms2 = min(chain(scan, q1, 100) for _ in range(3)) * 1e3
    print(f"int8_scan_reinterleaved_ms={scan_ms2:.3f}  "
          f"int8_vs_bf16={min(scan_ms, scan_ms2) / bf16_ms:.2f}x")

    # VARIANT: bf16-dot over int8-stored codes. Reads stay 1 B/element;
    # the i8->bf16 convert rides the dot's operand stream. Numerically
    # IDENTICAL to the i32-accumulate dot: int8 values are exact in bf16
    # (<=7 mantissa bits), every product fits f32 exactly, and a 512-term
    # sum of |x|<=16129 integers is exact in f32. If XLA fuses the
    # convert (no 1 GB bf16 materialisation), this should approach the
    # bf16 scan's bandwidth discipline at half the bytes.
    from wise_tpu.ops.topk import int8_candidates_bf16dot

    scanb2 = jax.jit(
        lambda q, c, s: int8_candidates_bf16dot(
            q, c, s, n_valid=N, kc=KC, k=K, group=GROUP)
    )

    def scanb(q):
        return scanb2(q, codes, scales)

    vb = scanb(q1)
    va = scan(q1)
    assert (np.asarray(vb[1]) == np.asarray(va[1])).all(), \
        "bf16-dot variant changed candidate rows"
    bdot_ms = min(chain(scanb, q1, 100) for _ in range(3)) * 1e3
    scan_ms3 = min(chain(scan, q1, 100) for _ in range(3)) * 1e3
    print(f"int8_bf16dot_ms={bdot_ms:.3f} vs i32dot_reinterleave="
          f"{scan_ms3:.3f} ({bdot_ms / scan_ms3:.2f}x)")

    # host rerank half: gather KC rows from a host-resident f32 matrix and
    # re-score (the memmapped .widx equivalent; matrix contents don't
    # affect gather+GEMM cost)
    host_vecs = np.random.default_rng(0).standard_normal(
        (N, D)).astype(np.float32)
    qh = np.asarray(q1)
    _, cand = scan(q1)
    cand_h = np.asarray(cand)
    t0 = time.perf_counter()
    reps = 100
    for _ in range(reps):
        vals, rows = rerank_exact_f32(qh, cand_h, host_vecs, K, n_valid=N)
    rerank_ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"rerank_only_ms={rerank_ms:.3f} (host gather {KC}x{D} + f32 "
          f"re-score, 1 core)")

    # end-to-end: scan dispatch + candidate readback + host rerank
    def end_to_end(q):
        _, cand = scan(q)
        return rerank_exact_f32(qh, np.asarray(cand), host_vecs, K,
                                n_valid=N)

    t_best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(50):
            end_to_end(q1)
        dt = (time.perf_counter() - t0) / 50
        t_best = dt if t_best is None else min(t_best, dt)
    print(f"end_to_end_ms={t_best * 1e3:.3f} (incl. candidate readback "
          f"through the tunnel)")
    print(f"attribution: scan {scan_ms:.3f} ms + readback+rerank "
          f"{t_best * 1e3 - scan_ms:.3f} ms")


if __name__ == "__main__":
    main()
