#!/bin/bash
# Stage-2 launcher (reference dist_run_cam.bash analog).
python scripts/train.py --stage cam --config configs/cam.yaml "$@"
