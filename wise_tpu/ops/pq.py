"""Product quantization (PQ) training/encoding in JAX.

Backs IndexIVFPQ (the reference's best 55M-vector config is IVF+PQ
{dim 768, M 8, nlist 65536} at 0.098 s/query and 40 GB,
docs/Search-Index-Evaluation.md). Vectors are split into M subspaces; each
subspace gets a 256-entry k-means codebook trained on coarse-cell residuals;
codes are uint8 (N, M) — a 4*dim/M x compression. Search uses asymmetric
distance computation (ADC): per query build an (M, 256) lookup table of
subspace inner products, then score candidates by summing table entries.
"""

from __future__ import annotations

import numpy as np

from .kmeans import kmeans


def train_pq(
    residuals: np.ndarray, m: int, ksub: int = 256, iters: int = 15,
    seed: int = 0,
) -> np.ndarray:
    """residuals (N, D) -> codebooks (M, ksub, D/M) float32."""
    n, d = residuals.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by M={m}")
    dsub = d // m
    codebooks = np.zeros((m, ksub, dsub), dtype=np.float32)
    for i in range(m):
        sub = residuals[:, i * dsub : (i + 1) * dsub]
        cb, _ = kmeans(sub, min(ksub, n), iters=iters, seed=seed + i)
        codebooks[i, : cb.shape[0]] = cb[:ksub]  # zero-pad degenerate books
    return codebooks


def encode_pq(residuals: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """-> codes (N, M) uint8 (nearest codebook entry per subspace, L2)."""
    n, d = residuals.shape
    m, ksub, dsub = codebooks.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for i in range(m):
        sub = residuals[:, i * dsub : (i + 1) * dsub]
        c = codebooks[i]
        # argmin ||x - c||^2 = argmax (2 x.c - |c|^2)
        scores = 2.0 * sub @ c.T - np.sum(c * c, axis=1)[None, :]
        codes[:, i] = np.argmax(scores, axis=1).astype(np.uint8)
    return codes


def adc_tables(query: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """query (D,) -> (M, ksub) inner-product lookup tables."""
    m, ksub, dsub = codebooks.shape
    q = query.reshape(m, dsub)
    return np.einsum("md,mkd->mk", q, codebooks).astype(np.float32)


def adc_scores(codes: np.ndarray, tables: np.ndarray) -> np.ndarray:
    """codes (N, M) uint8, tables (M, ksub) -> (N,) summed IP scores."""
    n, m = codes.shape
    out = np.zeros(n, dtype=np.float32)
    for i in range(m):
        out += tables[i][codes[:, i]]
    return out
