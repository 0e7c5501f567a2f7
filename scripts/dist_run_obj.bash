#!/bin/bash
# Stage-3 launcher (reference dist_run_obj.bash analog).
python scripts/train.py --stage obj --config configs/obj.yaml "$@"
