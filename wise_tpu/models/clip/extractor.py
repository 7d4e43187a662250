"""OpenCLIP-compatible feature extractor on the JAX CLIP towers.

Drop-in for the reference's MlfoundationOpenClip
(src/feature/mlfoundation_openclip.py:25-108): same 4-token id scheme
(``mlfoundations/open_clip/<model>/<pretrained>``), same L2-normalised
float32 outputs. Device work (preprocess + forward) is one jitted call;
batches pad to fixed buckets so XLA compiles a handful of shapes once.

Checkpoints: looks for ``open_clip_*.{pt,bin,npz}`` under
``$WISE_CHECKPOINT_DIR/<model>/<pretrained>/`` (or
``~/.cache/wise_tpu/checkpoints/...``); a ``bpe_simple_vocab_16e6.txt.gz``
alongside enables real CLIP tokenisation. Without a checkpoint the towers
initialise randomly (deterministic seed) — the full pipeline still runs for
benchmarking/integration, with a warning that retrieval quality needs real
weights.
"""

from __future__ import annotations

import functools
import logging
import os
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..feature_extractor import BucketPolicy, FeatureExtractor
from .model import CLIP, get_clip_config
from .preprocess import preprocess_images, preprocess_images_gemm
from .tokenizer import get_tokenizer

logger = logging.getLogger(__name__)


def _checkpoint_dir(model: str, pretrained: str) -> Path:
    root = os.environ.get(
        "WISE_CHECKPOINT_DIR",
        str(Path.home() / ".cache" / "wise_tpu" / "checkpoints"),
    )
    return Path(root) / model / pretrained


def _find_checkpoint(d: Path) -> Optional[Path]:
    if not d.exists():
        return None
    for pat in ("*.npz", "*.pt", "*.bin", "*.safetensors"):
        hits = sorted(d.glob(pat))
        if hits:
            return hits[0]
    return None


def production_clip_config(model_name: str):
    """The extractor's inference config for a model: bf16 activations by
    default (MXU peak ~4x f32 on v5e; params/LN/outputs stay f32 —
    WISE_CLIP_DTYPE=float32 to override) plus the kernel gates. bench.py
    uses this too, so the headline benchmark always measures the
    production serving configuration."""
    import dataclasses as _dc

    cfg = get_clip_config(model_name)
    dtype_name = os.environ.get("WISE_CLIP_DTYPE", "bfloat16")
    return _dc.replace(
        cfg,
        dtype=jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32,
        # inference path: fused VMEM attention where shapes allow
        # (ops/attention.py; WISE_FUSED_ATTN=0 to disable)
        fused_attention=(
            dtype_name == "bfloat16"
            and os.environ.get("WISE_FUSED_ATTN", "1") != "0"
        ),
        # whole-residual-block kernels (ops/block.py) — supersede the
        # attention kernel per layer where supports_fused_block admits
        # the shapes. Production default since the round-3 hardware A/B:
        # all-kernel layers dodge XLA's per-layer relayout copies at the
        # Pallas boundary — ViT-B/32 13.4k vs 9.8k frames/s
        # (scripts/bench_encoder_ab.py; WISE_FUSED_BLOCK=0 to disable)
        fused_block=(
            dtype_name == "bfloat16"
            and os.environ.get("WISE_FUSED_BLOCK", "1") != "0"
        ),
        # patchify+GEMM patch embed (WISE_PATCH_MATMUL=1 to try; pending
        # the hardware A/B)
        patch_embed_matmul=os.environ.get("WISE_PATCH_MATMUL", "0") == "1",
        # last-layer pooled-row computation for cls towers (identical
        # math; ~1 layer saved per image pass — see CLIPConfig docstring;
        # WISE_POOL_LAST=0 to disable)
        pool_last_block=os.environ.get("WISE_POOL_LAST", "1") != "0",
        # bf16 residual-stream carry through the fused kernel path —
        # measured SLOWER than the f32 carry at ViT-B/32 (see
        # CLIPConfig.bf16_stream); opt-in for re-probing other shapes
        bf16_stream=os.environ.get("WISE_BF16_STREAM", "0") == "1",
    )


class OpenClipExtractor(FeatureExtractor):
    supports_audio = False

    def __init__(self, id: str):
        tok = id.split("/")
        if len(tok) != 4 or not id.startswith("mlfoundations/open_clip/"):
            raise ValueError(f"invalid open_clip extractor id {id}")
        self.id = id
        self.model_name, self.pretrained = tok[2], tok[3]
        self.config = production_clip_config(self.model_name)
        self.output_dim = self.config.embed_dim
        self.input_size = (self.config.image_size, self.config.image_size)

        self.model = CLIP(self.config)
        ckpt_dir = _checkpoint_dir(self.model_name, self.pretrained)
        ckpt = _find_checkpoint(ckpt_dir)
        orbax_steps = (
            sorted(ckpt_dir.glob("step_*")) if ckpt_dir.exists() else []
        )
        if ckpt is None and orbax_steps:
            # fine-tuned checkpoint written by cli/train.py (orbax): point
            # WISE_CHECKPOINT_DIR at the project's checkpoints dir to serve it
            import orbax.checkpoint as ocp

            logger.info(f"loading fine-tuned checkpoint {orbax_steps[-1]}")
            with ocp.StandardCheckpointer() as ckptr:
                restored = ckptr.restore(orbax_steps[-1].absolute())
            self.params = jax.device_put(restored["params"])
        elif ckpt is not None:
            from .convert import load_checkpoint

            logger.info(f"loading CLIP checkpoint {ckpt}")
            self.params = jax.device_put(
                {"params": load_checkpoint(ckpt, self.config)}
            )
        else:
            logger.warning(
                f"no checkpoint for {id} under {ckpt_dir}; using random "
                "weights (pipeline runs, retrieval quality needs real weights)"
            )
            rng = jax.random.PRNGKey(0)
            self.params = self.model.init(
                rng,
                jnp.zeros(
                    (1, self.config.image_size, self.config.image_size, 3),
                    jnp.float32,
                ),
                jnp.zeros((1, self.config.context_length), jnp.int32),
            )

        if self.config.text_tower == "hf_xlm_roberta":
            # sentencepiece vocab unavailable offline -> hash fallback with
            # RoBERTa padding convention
            from .tokenizer import HashTokenizer

            self.tokenizer = HashTokenizer(
                vocab_size=self.config.vocab_size,
                context_length=self.config.context_length,
                pad_id=1,
            )
        else:
            bpe = ckpt_dir / "bpe_simple_vocab_16e6.txt.gz"
            self.tokenizer = get_tokenizer(
                bpe if bpe.exists() else None,
                vocab_size=self.config.vocab_size,
                context_length=self.config.context_length,
            )

        # bf16 towers take the GEMM resize (2.5x faster preprocess,
        # ~bf16-ulp pixel delta — measured embedding impact in
        # BENCHMARKS.md); parity/f32 towers keep the HIGHEST-precision
        # jax.image path.
        use_gemm_pre = (
            jnp.dtype(self.config.dtype) == jnp.bfloat16
            and os.environ.get("WISE_PREPROCESS_GEMM", "1") == "1"
        )
        pre_fn = preprocess_images_gemm if use_gemm_pre else preprocess_images

        @functools.partial(jax.jit, static_argnames=())
        def _encode_image(params, frames_u8):
            x = pre_fn(frames_u8, self.config.image_size)
            return self.model.apply(params, x, method=CLIP.encode_image)

        @jax.jit
        def _encode_preprocessed(params, x):
            return self.model.apply(params, x, method=CLIP.encode_image)

        @jax.jit
        def _encode_text(params, tokens):
            return self.model.apply(params, tokens, method=CLIP.encode_text)

        self._encode_image = _encode_image
        self._encode_preprocessed = _encode_preprocessed
        self._encode_text = _encode_text
        self._image_buckets = BucketPolicy()
        self._text_buckets = BucketPolicy()

    # ------------------------------------------------------------------
    def preprocess_image(self, images) -> np.ndarray:
        """Host-side canonicalisation: centre-crop to square + area-resize to
        the model size, keeping frames uint8. This fixes the device graph's
        input shape regardless of source resolution (otherwise every distinct
        video resolution would trigger a fresh XLA compile); the remaining
        normalisation runs fused on-device. cv2 INTER_AREA stands in for
        PIL's antialiased bicubic on the downscale (both antialias; kernel
        differs — retrieval-insignificant, noted for parity audits)."""
        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = images[None]
        s = self.config.image_size
        out = []
        for im in images:
            im = np.asarray(im)
            h, w = im.shape[:2]
            if (h, w) != (s, s):
                import cv2

                square = min(h, w)
                top, left = (h - square) // 2, (w - square) // 2
                im = im[top : top + square, left : left + square]
                interp = (
                    cv2.INTER_AREA if square > s else cv2.INTER_CUBIC
                )
                im = cv2.resize(im, (s, s), interpolation=interp)
            out.append(im)
        return np.stack(out)

    def extract_image_features_dispatch(self, images: np.ndarray):
        """Device-dispatch half of ``extract_image_features``: returns the
        UNREALISED (n, D) embedding as a jax array. The serving coalescer
        (api/engine.py two-phase mode) dispatches batches under its lock
        and realises per-request slices outside it, so tower forwards
        pipeline across request batches instead of serialising on each
        device->host readback."""
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        s = self.config.image_size
        if images.dtype == np.uint8 and os.environ.get(
            "WISE_PREPROCESS", ""
        ) == "exact":
            # bit-faithful reference preprocessing (PIL resize-first); slow,
            # for parity audits — see preprocess.preprocess_images_exact
            from .preprocess import preprocess_images_exact

            images = preprocess_images_exact(images, s)
        elif images.shape[1:3] != (s, s):
            images = self.preprocess_image(images)  # canonicalise host-side
        n = images.shape[0]
        m = self._image_buckets.pick(n)
        if images.dtype == np.uint8:
            if m != n:
                images = np.concatenate(
                    [images, np.zeros((m - n,) + images.shape[1:], np.uint8)]
                )
            out = self._encode_image(self.params, jnp.asarray(images))
        else:
            if m != n:
                images = np.concatenate(
                    [images, np.zeros((m - n,) + images.shape[1:], images.dtype)]
                )
            out = self._encode_preprocessed(
                self.params, jnp.asarray(images, dtype=jnp.float32)
            )
        return out[:n]

    def extract_image_features(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(
            self.extract_image_features_dispatch(images), dtype=np.float32
        )

    def extract_text_features_dispatch(self, text_query: List[str]):
        """Dispatch-only text embed (see extract_image_features_dispatch)."""
        tokens = self.tokenizer(list(text_query))
        n = tokens.shape[0]
        m = self._text_buckets.pick(n)
        if m != n:
            pad = np.full(
                (m - n, tokens.shape[1]),
                getattr(self.tokenizer, "pad_id", 0),
                dtype=tokens.dtype,
            )
            pad[:, 0] = getattr(self.tokenizer, "eot", 0)
            tokens = np.concatenate([tokens, pad])
        out = self._encode_text(self.params, jnp.asarray(tokens))
        return out[:n]

    def extract_text_features(self, text_query: List[str]) -> np.ndarray:
        return np.asarray(
            self.extract_text_features_dispatch(text_query), dtype=np.float32
        )
