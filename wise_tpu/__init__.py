"""wise_tpu — a TPU-native multimodal (video/audio/image) search framework.

A ground-up JAX/XLA/Pallas re-architecture of the capabilities of ox-vgg/WISE 2:
offline media ingestion (decode -> device preprocessing -> batched encoder
inference), sharded HBM-resident vector indices with Pallas distance-scan +
top-k kernels, and online multimodal search served over CLI and REST.

Layer map (bottom to top; see SURVEY.md for the reference analysis):

- ``wise_tpu.utils``    — hashing, mime sniffing, small helpers
- ``wise_tpu.project``  — project directory layout + asset discovery
- ``wise_tpu.db``       — sqlite metadata DB (schema + repositories)
- ``wise_tpu.store``    — sharded feature stores (tar / npz)
- ``wise_tpu.io``       — media decode (native FFmpeg ext / OpenCV) + datasets
- ``wise_tpu.ops``      — Pallas/XLA kernels: top-k scan, log-mel, image prep
- ``wise_tpu.models``   — feature extractors (CLIP, CLAP, random) in Flax
- ``wise_tpu.index``    — search indices (flat, IVF, FTS) on the ops layer
- ``wise_tpu.parallel`` — device mesh, shardings, multi-chip search/training
- ``wise_tpu.search``   — query processing, temporal merge, grammar parser
- ``wise_tpu.api``      — REST server (stdlib HTTP, FastAPI-compatible routes)
- ``wise_tpu.cli``      — extract-features / create-index / search / serve
"""

__version__ = "0.1.0"
