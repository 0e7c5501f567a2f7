#!/bin/bash
# Stage-1 launcher (reference dist_run_lora.bash analog).
# Single host: JAX uses all local chips automatically; multi-host: run this
# on every host with --distributed.
python scripts/train.py --stage lora --config configs/lora.yaml "$@"
