#!/usr/bin/env python
"""Profile one CFG UNet forward on the TPU and print the device-time
breakdown by op category and by top ops.

The tensorboard-plugin-profile converters are broken against this
environment's TF build, so this parses the raw xplane.pb with a minimal
locally-compiled schema (protoc is in the image).  Methodology matches
PERF.md: zero params, bench shapes, trace the second (compiled) run.

  python scripts/profile_unet.py [--steps 3] [--outdir /tmp/synfmc_prof]
"""

import argparse
import collections
import glob
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from synfmc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # + honors JAX_PLATFORMS (the remote-TPU plugin ignores the env var)

_XPLANE_PROTO = """
syntax = "proto3";
package profparse;
message XSpace { repeated XPlane planes = 1; }
message XPlane {
  int64 id = 1; string name = 2; repeated XLine lines = 3;
  map<int64, XEventMetadata> event_metadata = 4;
  map<int64, XStatMetadata> stat_metadata = 5;
}
message XLine {
  int64 id = 1; string name = 2; int64 timestamp_ns = 3;
  repeated XEvent events = 4; int64 duration_ps = 9;
  int64 display_id = 10; string display_name = 11;
}
message XEvent {
  int64 metadata_id = 1;
  oneof data { int64 offset_ps = 2; int64 num_occurrences = 5; }
  int64 duration_ps = 3; repeated XStat stats = 4;
}
message XEventMetadata {
  int64 id = 1; string name = 2; bytes metadata = 3;
  string display_name = 4; repeated XStat stats = 5; repeated int64 child_id = 6;
}
message XStat {
  int64 metadata_id = 1;
  oneof value {
    double double_value = 2; uint64 uint64_value = 3; int64 int64_value = 4;
    string str_value = 5; bytes bytes_value = 6; uint64 ref_value = 7;
  }
}
message XStatMetadata { int64 id = 1; string name = 2; string description = 3; }
"""


def build_xplane_pb2():
    d = tempfile.mkdtemp(prefix="xplane_proto_")
    with open(os.path.join(d, "xplane.proto"), "w") as f:
        f.write(_XPLANE_PROTO)
    subprocess.run(["protoc", f"--python_out={d}", "xplane.proto"], cwd=d, check=True)
    sys.path.insert(0, d)
    import xplane_pb2  # noqa: E402

    return xplane_pb2


CATEGORIES = [
    ("relayout/copy", re.compile(r"^(%?)(copy|transpose|bitcast)" )),
    ("convolution", re.compile(r"convolution|conv")),
    ("pallas attention", re.compile(r"attn|flash|temporal_|custom-call")),
    ("all-reduce/collective", re.compile(r"all-reduce|all-gather|collective")),
    ("fusion (matmul/elementwise)", re.compile(r"fusion|dot")),
]


def categorize(name: str) -> str:
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def _profiled_train_step():
    """Build the full-scale stage-2 train step + batch (bench_train setup)."""
    import jax
    import jax.numpy as jnp

    from synfmc_tpu.config import ConfigDict
    from synfmc_tpu.diffusion import DiffusionSchedule
    from synfmc_tpu.training.optim import make_optimizer
    from synfmc_tpu.training.params import partition_params, stage2_cmc_unet_trainable
    from synfmc_tpu.training.steps import StepConfig, TrainState, make_cam_train_step
    from synfmc_tpu.training.trainers import build_models

    h, w, b, f = 256, 384, 1, 16
    models = build_models(ConfigDict({"unet_additional_kwargs": {"use_motion_module": True}}),
                          "cam", dtype=jnp.bfloat16)
    schedule = DiffusionSchedule.from_config()
    tx = make_optimizer(1e-4)
    cfg = StepConfig(apply_masked_loss=True, sample_height=h, sample_width=w, remat=True)
    hl, wl = h // 8, w // 8
    chs = models["unet"].block_out_channels
    xdim = models["unet"].cross_attention_dim
    pose_feats = [jnp.zeros((1, f, hl // 2**i, wl // 2**i, c)) for i, c in enumerate(chs)]
    shapes = {
        "unet": jax.eval_shape(lambda r: models["unet"].init(
            r, jnp.zeros((1, f, hl, wl, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, xdim)), pose_features=pose_feats), jax.random.PRNGKey(0)),
        "pose_encoder": jax.eval_shape(lambda r: models["pose_encoder"].init(
            r, jnp.zeros((1, f, h, w, 6))), jax.random.PRNGKey(1)),
        "vae": jax.eval_shape(lambda r: models["vae"].init(
            r, jnp.zeros((1, h, w, 3)), jax.random.PRNGKey(9)), jax.random.PRNGKey(2)),
        "text": jax.eval_shape(lambda r: models["text"].init(
            r, jnp.zeros((1, 77), jnp.int32)), jax.random.PRNGKey(3)),
    }
    params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = {k: v["params"] for k, v in params.items()}
    t_unet, f_unet = partition_params(params["unet"], stage2_cmc_unet_trainable)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       trainable={"unet": t_unet, "pose_encoder": params["pose_encoder"]},
                       opt_state=tx.init({"unet": t_unet, "pose_encoder": params["pose_encoder"]}))
    frozen = {"unet": f_unet, "vae": {"params": params["vae"]}, "text": {"params": params["text"]}}
    step = jax.jit(make_cam_train_step(models["unet"], models["pose_encoder"], models["vae"],
                                       models["text"], schedule, tx, cfg), donate_argnums=(0,))
    batch = {
        "pixel_values": jax.random.normal(jax.random.PRNGKey(5), (b, f, h, w, 3), jnp.float32) * 0.5,
        "input_ids": jnp.ones((b, 77), jnp.int32),
        "background_ids": jnp.ones((b, 77), jnp.int32),
        "null_ids": jnp.ones((77,), jnp.int32),
        "camera_rt": jnp.tile(jnp.asarray([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], jnp.float32), (b, f, 1)),
        "intrinsics": jnp.tile(jnp.asarray([24.0, 36.0, 0.0, 0.0], jnp.float32), (b, f, 1)),
        "obj_union_mask": jnp.ones((b, f, h, w, 1), jnp.float32) * 0.5,
    }
    return step, state, frozen, batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="/tmp/synfmc_prof")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--train-step", action="store_true",
                   help="profile the full stage-2 train step instead of the CFG forward")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from synfmc_tpu.models.unet3d import UNet3D

    if args.train_step:
        step, state, frozen, batch = _profiled_train_step()
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(7))
        _ = float(metrics["loss"])  # compile + warm
        print("# compiled; tracing one train step", file=sys.stderr)
        os.makedirs(args.outdir, exist_ok=True)
        with jax.profiler.trace(args.outdir):
            batch2 = dict(batch, pixel_values=batch["pixel_values"] + 1e-3)
            state, metrics = step(state, frozen, batch2, jax.random.PRNGKey(8))
            _ = float(metrics["loss"])
    else:
        dtype = jnp.bfloat16
        chs = (320, 640, 1280, 1280)
        b, f, hl, wl = 1, 16, 32, 48
        unet = UNet3D(block_out_channels=chs, attn_heads=8, cross_attention_dim=768,
                      use_motion_module=True, camera_cond=True, lora_rank=2, dtype=dtype)
        rng = jax.random.PRNGKey(0)
        lat = jax.random.normal(rng, (2 * b, f, hl, wl, 4), dtype)
        ctx = jax.random.normal(rng, (2 * b, 77, 768), dtype)
        pose = [jax.random.normal(rng, (2 * b, f, hl // 2**i, wl // 2**i, c), dtype) * 0.02
                for i, c in enumerate(chs)]
        traj = [p_ * 0.5 for p_ in pose]
        shapes = jax.eval_shape(lambda r: unet.init(r, lat, jnp.zeros((2 * b,), jnp.int32), ctx,
                                                    pose_features=pose, traj_features=traj),
                                jax.random.PRNGKey(1))
        params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        fwd = jax.jit(lambda p_, l_: unet.apply(p_, l_, jnp.full((2 * b,), 500), ctx,
                                                pose_features=pose, traj_features=traj))
        out = fwd(params, lat)
        _ = float(jnp.sum(out.astype(jnp.float32)))  # compile + warm
        print("# compiled; tracing one forward", file=sys.stderr)

        os.makedirs(args.outdir, exist_ok=True)
        with jax.profiler.trace(args.outdir):
            lat2 = lat + 1e-3
            out = fwd(params, lat2)
            _ = float(jnp.sum(out.astype(jnp.float32)))

    pbs = sorted(glob.glob(os.path.join(args.outdir, "**", "*.xplane.pb"), recursive=True),
                 key=os.path.getmtime)
    assert pbs, f"no xplane.pb under {args.outdir}"
    xplane_pb2 = build_xplane_pb2()
    space = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as fh:
        space.ParseFromString(fh.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        print(f"\n== plane: {plane.name}")
        for line in plane.lines:
            tot = sum(ev.duration_ps for ev in line.events)
            print(f"   line {line.name!r}: {len(line.events)} events, {tot/1e9:.2f} ms summed")
        for line in plane.lines:
            # 'XLA Ops' carries the serialized device op timeline; async
            # copy/slice -start events elsewhere overlap compute and must not
            # be summed into the breakdown.
            if line.name != "XLA Ops":
                continue
            by_name = collections.Counter()
            calls = collections.Counter()
            for ev in line.events:
                nm = meta[ev.metadata_id].name
                if re.search(r"-(start|done)(\.|$| )", nm) or nm.startswith("%copy-start"):
                    continue
                by_name[nm] += ev.duration_ps
                calls[nm] += 1
            total = sum(by_name.values())
            print(f"\n  XLA Ops (sync) total {total/1e9:.2f} ms")
            by_cat = collections.Counter()
            for nm, ps in by_name.items():
                by_cat[categorize(nm)] += ps
            for cat, ps in by_cat.most_common():
                print(f"  {cat:<32} {ps/1e9:8.2f} ms  {100*ps/total:5.1f}%")
            print(f"  -- top {args.top} ops --")
            for nm, ps in by_name.most_common(args.top):
                print(f"  {ps/1e9:8.3f} ms  x{calls[nm]:<4} {nm[:110]}")


if __name__ == "__main__":
    main()
