#!/usr/bin/env python
"""Unified training CLI — the `torchrun train_*.py --config` replacement.

Usage:
  python scripts/train.py --stage lora --config configs/lora.yaml
  python scripts/train.py --stage cam  --config configs/cam.yaml
  python scripts/train.py --stage obj  --config configs/obj.yaml

Multi-host: set --distributed (calls jax.distributed.initialize(), the
NCCL/torchrun replacement; SURVEY.md §2.6).  The reference's
--launcher {pytorch,slurm,single} trichotomy collapses to this flag.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", required=True, choices=["lora", "cam", "obj"])
    parser.add_argument("--config", required=True)
    parser.add_argument("--distributed", action="store_true", help="multi-host: jax.distributed.initialize()")
    parser.add_argument("--max-steps", type=int, default=None, help="override max_train_steps")
    # accepted for reference-CLI parity; ignored (JAX needs no port/launcher)
    parser.add_argument("--launcher", default="single")
    parser.add_argument("--port", type=int, default=0)
    args = parser.parse_args()

    import jax

    # persistent compile cache (same dirs the tests/benches use: full-model
    # compiles are minutes cold)
    from synfmc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    if args.distributed:
        jax.distributed.initialize()

    from synfmc_tpu.config import load_config
    from synfmc_tpu.training.trainers import train

    config = load_config(args.config)
    metrics = train(args.stage, config, max_steps_override=args.max_steps)
    if jax.process_index() == 0:
        print({k: v for k, v in metrics.items()})


if __name__ == "__main__":
    main()
