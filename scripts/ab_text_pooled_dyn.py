"""End-to-end A/B of the dynamic-row pooled last layer on the CLIP text
tower (pool_last_block on/off, production ViT-B/32 text shape, real TPU).
See BENCHMARKS.md "Pooled last layer" and ops/block.fused_attn_block_pooled_dyn."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os, time, dataclasses as dc
import numpy as np, jax, jax.numpy as jnp
from wise_tpu.models.clip.model import CLIP
from wise_tpu.models.clip.extractor import production_clip_config

cfg = production_clip_config("ViT-B-32")
B = 512
toks = np.random.randint(1, 40000, (B, 77)).astype(np.int32)
eot = np.random.randint(5, 77, (B,))
toks[np.arange(B), eot] = 49407  # highest id = argmax pool row
toks = jnp.asarray(toks)

results = {}
for pool in (False, True):
    c = dc.replace(cfg, pool_last_block=pool)
    model = CLIP(c)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), toks[:1])
    fn = jax.jit(lambda p, t: model.apply(p, t, method=CLIP.encode_text))
    out = fn(params, toks)
    np.asarray(out)  # sync
    def chain(n=50):
        t = toks
        o = None
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(params, t)
            t = t.at[0, 0].set((o[0, 0] > 0).astype(jnp.int32) + 1)
        np.asarray(o[0, 0])
        return (time.perf_counter() - t0) / n
    best = min(chain(), chain(), chain())
    results[pool] = (best, np.asarray(out, np.float32))
    print(f"pool_last_block={pool}: {best*1e3:.3f} ms/step ({B/best:.0f} caps/s)")

a, b = results[False][1], results[True][1]
cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
print("cos min/mean:", cos.min(), cos.mean())
print(f"speedup: {results[False][0]/results[True][0]:.3f}x")
