"""train CLI: contrastive CLIP fine-tuning on a project's caption metadata.

New capability over the reference (inference-only). Runs the GSPMD-sharded
train step over the available device mesh, checkpoints with orbax, and can
resume.

    python -m wise_tpu.cli.train --project-dir P \\
        --metadata-id EK/ann/train --caption-column narration \\
        --model ViT-B-32 --steps 1000 --batch-size 64
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(prog="train", description=__doc__)
    p.add_argument("--project-dir", required=True)
    p.add_argument("--metadata-id", required=True,
                   help="FOLDER/DB/TABLE with __filename/__starttime/__stoptime")
    p.add_argument("--caption-column", required=True)
    p.add_argument("--model", default="ViT-B-32")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--learning-rate", type=float, default=1e-5)
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--mp", type=int, default=1)
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages (GPipe over a 'pp' mesh "
                        "axis; excludes --mp, needs layer counts divisible "
                        "by it)")
    p.add_argument("--microbatches", type=int, default=2,
                   help="GPipe microbatches per step (only with --pp > 1)")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--remat", action="store_true",
                   help="rematerialise transformer blocks in the backward "
                        "(trades ~1 extra forward for activation memory — "
                        "needed to fit ViT-H-class fine-tunes on one 16 GB "
                        "chip, where params+Adam alone are ~10 GB)")
    return p


def training_clip_config(model: str, dtype: str = "bfloat16", pp: int = 1,
                         remat: bool = False):
    """The train CLI's model config: bf16 fine-tuning runs the whole-block
    Pallas kernels + pooled last layer by DEFAULT since the round-4
    saved-activation backward (the ``*_train`` wrappers' custom VJP
    consumes the kernel-emitted qkv / pre-gelu residuals instead of
    recomputing the plain forward): train-step A/B 1.042x vs XLA at
    ViT-B/32 B=256 (scripts/bench_train_step.py; the round-3 recompute
    backward measured 0.90x, which is why this was previously off).
    WISE_FUSED_BLOCK=0 / WISE_POOL_LAST=0 opt out; pp training keeps the
    kernels off (not calibrated inside the pp shard_map)."""
    import jax.numpy as jnp

    from ..models.clip.model import get_clip_config

    bf16 = dtype == "bfloat16"
    return dataclasses.replace(
        get_clip_config(model),
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
        remat=remat,
        fused_block=(
            bf16 and pp <= 1
            and os.environ.get("WISE_FUSED_BLOCK", "1") != "0"
        ),
        pool_last_block=(
            bf16 and pp <= 1
            and os.environ.get("WISE_POOL_LAST", "1") != "0"
        ),
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("train")

    import jax
    import jax.numpy as jnp

    from ..models.clip.tokenizer import get_tokenizer
    from ..parallel.mesh import get_mesh
    from ..parallel.train import CLIPTrainer
    from ..pipeline.train_data import caption_batches, load_caption_segments
    from ..project import WiseProject

    project = WiseProject(args.project_dir)
    segments = load_caption_segments(
        project, args.metadata_id, args.caption_column
    )
    if not segments:
        log.error("no caption segments found")
        return 1
    log.info(f"{len(segments)} caption segments")

    config = training_clip_config(args.model, args.dtype, args.pp,
                                  remat=args.remat)
    if args.pp > 1:
        if args.mp != 1:
            log.error("--pp and --mp are mutually exclusive")
            return 1
        from ..parallel.mesh import get_pp_mesh
        from ..parallel.pp_train import PipelinedCLIPTrainer

        mesh = get_pp_mesh(pp=args.pp, dp=args.dp)
        denom = mesh.shape["dp"] * args.microbatches
        if args.batch_size % denom:
            log.error(
                f"--batch-size {args.batch_size} must divide by "
                f"dp*microbatches = {mesh.shape['dp']}*{args.microbatches}"
            )
            return 1
        trainer = PipelinedCLIPTrainer(
            config, mesh, n_microbatches=args.microbatches,
            learning_rate=args.learning_rate,
            warmup_steps=args.warmup_steps, total_steps=args.steps,
            grad_clip=args.grad_clip,
        )
    else:
        mesh = get_mesh(dp=args.dp, mp=args.mp)
        trainer = CLIPTrainer(
            config, mesh, learning_rate=args.learning_rate,
            warmup_steps=args.warmup_steps, total_steps=args.steps,
            grad_clip=args.grad_clip,
        )
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    start_step = 0
    ckpt_dir = args.checkpoint_dir or str(
        project.project_dir / "checkpoints" / args.model
    )
    if args.resume:
        try:
            start_step, params, opt_state = trainer.restore_checkpoint(
                ckpt_dir, params, opt_state
            )
            log.info(f"resumed from step {start_step}")
        except FileNotFoundError:
            log.info("no checkpoint found; starting fresh")
    step_fn = trainer.make_train_step()
    tokenizer = get_tokenizer(
        None, vocab_size=config.vocab_size,
        context_length=config.context_length,
    )

    batches = caption_batches(
        segments, tokenizer, args.batch_size, config.image_size,
        epochs=10_000,
    )
    t0 = time.time()
    step = start_step
    for images, tokens in batches:
        if step >= args.steps:
            break
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(images), jnp.asarray(tokens)
        )
        step += 1
        if step % 10 == 0 or step == args.steps:
            log.info(
                f"step {step}/{args.steps} loss={float(loss):.4f} "
                f"({step - start_step}/{time.time()-t0:.0f}s)"
            )
        if args.checkpoint_every and step % args.checkpoint_every == 0:
            trainer.save_checkpoint(ckpt_dir, step, params, opt_state)
    if step == start_step:
        log.error(
            "no training steps ran — not enough decodable caption "
            "segments to fill a batch?"
        )
        return 1
    trainer.save_checkpoint(ckpt_dir, step, params, opt_state)
    log.info(f"saved final checkpoint at step {step} to {ckpt_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
