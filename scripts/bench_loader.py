#!/usr/bin/env python
"""Data-loader throughput benchmark (VERDICT r1 weak #2).

Measures (a) the serial cost of the FULL ``UnrealTrajVideoDataset.
__getitem__`` path (PNG reads, mask visibility, caption synthesis, sphere
masks, relative poses) at stage-2 scale (16 frames @ 256x384), and (b) the
multiprocess ShardedLoader's delivered samples/s.

Budget: the reference trains batch 1/GPU x 8 GPUs at ~0.98 s/step
(PERF.md), i.e. the host must sustain ~8.2 samples/s; 2x headroom =
16.3 samples/s.  Workers are independent processes, so delivered
throughput scales with available cores: on a 1-core dev box (b) equals
(a); the printed ``workers_for_2x_headroom`` says how many cores a real
TPU host needs — TPU-VM hosts have 100+.

  python scripts/bench_loader.py [--workers 8] [--batches 6]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from synfmc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # + honors JAX_PLATFORMS (the remote-TPU plugin ignores the env var)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workers", type=int, default=min(8, os.cpu_count() or 1))
    p.add_argument("--sweep", default=None, metavar="N,N,...",
                   help="measure a worker-scaling curve (e.g. 1,2,4) instead of "
                        "a single point; prints one JSON line per count")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--batches", type=int, default=6)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--step-budget-s", type=float, default=0.98,
                   help="device seconds per step at batch 8 (PERF.md)")
    p.add_argument("--no-native", action="store_true",
                   help="disable the first-party C++ decode path (A/B vs PIL)")
    args = p.parse_args()

    if args.no_native:
        os.environ["SYNFMC_NATIVE_IO"] = "0"

    import numpy as np

    from synfmc_tpu.data.dataset import UnrealTrajVideoDataset
    from synfmc_tpu.data.fixture import build_synthetic_dataset
    from synfmc_tpu.data.loader import ShardedLoader

    with tempfile.TemporaryDirectory() as root:
        t0 = time.time()
        kw = build_synthetic_dataset(root, num_seqs=4, num_objects=3,
                                     num_frames=64, height=256, width=384)
        print(f"# fixture built in {time.time() - t0:.1f}s", file=sys.stderr)
        ds = UnrealTrajVideoDataset(
            **kw, sample_n_frames=args.frames, sample_size=(256, 384),
            cam_translation_rescale_factor=1200, obj_translation_rescale_factor=1000,
            use_sphere_mask=True, max_objects=3, seed=0,
        )
        # (a) serial per-sample cost
        ds[0]  # warm page cache
        t0 = time.time()
        for i in range(4):
            ds[i % len(ds)]
        serial_s = (time.time() - t0) / 4
        print(f"# serial __getitem__: {serial_s * 1000:.0f} ms/sample", file=sys.stderr)

        # (b) delivered loader throughput (persistent worker pool)
        def measure(workers: int):
            loader = ShardedLoader(
                ds, batch_size=args.batch_size,
                collate_fn=UnrealTrajVideoDataset.collate_fn,
                num_workers=workers, process_index=0, process_count=1,
                drop_last=False,
            )
            n_needed = args.batches * args.batch_size
            loader._epoch_indices = lambda: np.arange(n_needed) % len(ds)  # type: ignore
            it = iter(loader)
            next(it)  # warm the worker pool
            t0 = time.time()
            n = 0
            for batch in it:
                n += len(batch["captions"])
            dt = time.time() - t0
            loader.close()
            return n / dt, n, dt

        budget = 8.0 / args.step_budget_s  # 8 samples per device step
        cores = os.cpu_count() or 1
        workers_for_2x = int(np.ceil(2 * budget * serial_s))
        counts = ([int(x) for x in args.sweep.split(",")] if args.sweep
                  else [args.workers])
        for workers in counts:
            sps, n, dt = measure(workers)
            print(
                f"# {n} samples in {dt:.2f}s, {workers} workers, {cores} cores; "
                f"need {workers_for_2x} worker-cores for 2x headroom",
                file=sys.stderr,
            )
            print(
                '{"metric": "loader_samples_per_sec_16f_256x384", '
                f'"value": {sps:.2f}, "unit": "samples/s", '
                f'"serial_ms_per_sample": {serial_s * 1000:.0f}, '
                f'"cores": {cores}, "workers": {workers}, '
                f'"vs_step_budget": {sps / budget:.2f}, '
                f'"workers_for_2x_headroom": {workers_for_2x}}}'
            )


if __name__ == "__main__":
    main()
