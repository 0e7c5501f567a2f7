"""End-to-end trainer smoke tests: fixture dataset -> N steps -> checkpoints."""

import glob
import os

import numpy as np
import pytest

from synfmc_tpu.config import ConfigDict, load_config
from synfmc_tpu.data.fixture import build_synthetic_dataset
from synfmc_tpu.training.trainers import train

pytestmark = pytest.mark.e2e

TINY_OVERRIDES = dict(
    block_out_channels=[32, 64, 128, 128],
    cross_attention_dim=32,
    attn_heads=4,
    vae_channels=[32, 32, 32, 32],
    text=dict(vocab_size=49408, hidden_size=32, num_layers=1, num_heads=2),
)


@pytest.fixture(scope="module")
def fixture_kwargs(tmp_path_factory):
    root = tmp_path_factory.mktemp("synfmc_train")
    return build_synthetic_dataset(str(root), num_seqs=2, num_objects=2, num_frames=48)


def _config(stage, fixture_kwargs, tmp_path):
    cfg = load_config(f"configs/{stage}.yaml")
    cfg["output_dir"] = str(tmp_path / "out")
    cfg["model_overrides"] = TINY_OVERRIDES
    cfg["train_batch_size"] = 2 if stage == "lora" else 1
    cfg["checkpointing_steps"] = 2
    cfg["logger_interval"] = 1
    cfg["num_workers"] = 2
    params = dict(fixture_kwargs)
    params["sample_size"] = [64, 128]
    if stage != "lora":
        params["sample_n_frames"] = 4
        params["max_objects"] = 2
    cfg["train_data"]["params"].update(params)
    # placeholders in the shipped configs are skipped by load_pretrained;
    # stage 3 additionally demands a real CMC ckpt unless explicitly waived
    if stage == "obj":
        cfg["allow_untrained_cm"] = True
    return cfg


def test_stage3_requires_cmc_checkpoint(fixture_kwargs, tmp_path):
    # Reference hard-asserts a trained CMC ckpt before stage 3
    # (train_cam_obj_ctrl.py:280); the placeholder path must NOT slip through.
    cfg = _config("obj", fixture_kwargs, tmp_path)
    cfg["allow_untrained_cm"] = False
    with pytest.raises(FileNotFoundError, match="CMC checkpoint"):
        train("obj", cfg, max_steps_override=1)


@pytest.mark.parametrize("stage", ["lora", "cam", "obj"])
def test_train_stage_smoke(stage, fixture_kwargs, tmp_path):
    cfg = _config(stage, fixture_kwargs, tmp_path)
    metrics = train(stage, cfg, max_steps_override=2)
    assert metrics["steps"] == 2
    assert np.isfinite(metrics["loss"])
    run_dir = metrics["run_dir"]
    assert os.path.exists(os.path.join(run_dir, "config.yaml"))
    ckpts = glob.glob(os.path.join(run_dir, "checkpoints", "*"))
    assert ckpts, "no checkpoints written"
    # reference-compatible bundle exists
    torch_bundles = glob.glob(os.path.join(run_dir, "checkpoints", "*.ckpt"))
    assert torch_bundles
    # the stage's main bundle carries epoch + a live torch AdamW
    # optimizer_state_dict so the reference's resume path can consume it
    # (train_image_lora.py:282-296); cmcm/img-lora side files in stage 3
    # legitimately carry None
    from synfmc_tpu.training.checkpoint import torch_load_state_dict

    main = {"lora": "lora-step", "cam": "cmcm-step", "obj": "omcm-step"}[stage]
    bundle = torch_load_state_dict(
        [p for p in torch_bundles if main in os.path.basename(p)][0]
    )
    assert isinstance(bundle["epoch"], int) and bundle["epoch"] >= 0
    assert bundle["global_step"] == 2
    opt_sd = bundle["optimizer_state_dict"]
    assert opt_sd is not None
    assert len(opt_sd["state"]) == len(opt_sd["param_names"]) > 0
    assert opt_sd["param_groups"][0]["params"] == list(range(len(opt_sd["state"])))
    assert all(float(s["step"]) == 2 for s in opt_sd["state"].values())


def test_resume_from_native_checkpoint(fixture_kwargs, tmp_path):
    """Orbax resume (reference: train_cam_ctrl.py:467-495): a second run
    restoring step-2 must continue the step counter and produce finite
    losses with restored optimizer state."""
    cfg = _config("cam", fixture_kwargs, tmp_path)
    m1 = train("cam", cfg, max_steps_override=2)
    step_dir = os.path.join(m1["run_dir"], "checkpoints", "step-2")
    assert os.path.isdir(step_dir), os.listdir(os.path.join(m1["run_dir"], "checkpoints"))

    cfg2 = _config("cam", fixture_kwargs, tmp_path)
    cfg2["resume_from"] = step_dir
    m2 = train("cam", cfg2, max_steps_override=4)  # resumes at 2, runs to 4
    assert m2["steps"] == 4
    assert np.isfinite(m2["loss"])


def test_resume_from_auto(fixture_kwargs, tmp_path):
    """``resume_from: auto`` finds the newest checkpoint across the job's
    timestamped run dirs (crash-restart without editing the config); with no
    prior attempt it starts fresh."""
    from synfmc_tpu.training.checkpoint import find_auto_resume

    cfg = _config("cam", fixture_kwargs, tmp_path)
    cfg["resume_from"] = "auto"
    m1 = train("cam", cfg, max_steps_override=2)  # first attempt: fresh
    assert m1["steps"] == 2

    name = cfg.get("name", "cam-run")
    found = find_auto_resume(cfg["output_dir"], name)
    assert found is not None and found.endswith("step-2")

    cfg2 = _config("cam", fixture_kwargs, tmp_path)
    cfg2["resume_from"] = "auto"
    m2 = train("cam", cfg2, max_steps_override=4)  # restart: picks up step-2
    assert m2["steps"] == 4
    assert np.isfinite(m2["loss"])
    # a different job name must not see this job's checkpoints
    assert find_auto_resume(cfg["output_dir"], "other-job") is None


def test_resume_is_exact(fixture_kwargs, tmp_path):
    """Crash-resume equals an uninterrupted run (VERDICT r3 #3 done
    criterion): per-step losses after the resume point AND the final weights
    match elementwise.  Pins the whole invariant chain — epoch arithmetic +
    mid-epoch batch skip (loader start_batch), per-(seed,epoch,idx) sample
    content, fold_in step RNG, and optimizer-state restore."""
    import orbax.checkpoint as ocp

    # uninterrupted: 5 steps (2-batch epochs -> ends mid-epoch 2)
    cfg_a = _config("cam", fixture_kwargs, tmp_path)
    cfg_a["output_dir"] = str(tmp_path / "out_a")
    cfg_a["record_loss_history"] = True
    m_a = train("cam", cfg_a, max_steps_override=5)

    # crashed at 3, resumed via resume_from: auto to 5
    cfg_b = _config("cam", fixture_kwargs, tmp_path)
    cfg_b["output_dir"] = str(tmp_path / "out_b")
    cfg_b["record_loss_history"] = True
    train("cam", cfg_b, max_steps_override=3)
    cfg_c = _config("cam", fixture_kwargs, tmp_path)
    cfg_c["output_dir"] = str(tmp_path / "out_b")
    cfg_c["record_loss_history"] = True
    cfg_c["resume_from"] = "auto"
    m_c = train("cam", cfg_c, max_steps_override=5)

    assert len(m_a["loss_history"]) == 5 and len(m_c["loss_history"]) == 2
    np.testing.assert_array_equal(
        np.asarray(m_a["loss_history"][3:]), np.asarray(m_c["loss_history"])
    )

    # final weights at step 5 identical between the two histories
    import jax

    ckptr = ocp.PyTreeCheckpointer()
    tree_a = ckptr.restore(os.path.join(m_a["run_dir"], "checkpoints", "step-5"))
    tree_c = ckptr.restore(os.path.join(m_c["run_dir"], "checkpoints", "step-5"))
    la, lc = jax.tree.leaves(tree_a), jax.tree.leaves(tree_c)
    assert len(la) == len(lc) > 0
    for a, c in zip(la, lc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_prefetch_and_async_ckpt_equal_serial(fixture_kwargs, tmp_path):
    """The pipelined input path (prefetch_batches, default on) and async
    checkpointing must be BIT-IDENTICAL to the serial path: same per-step
    losses, and the async step-2 checkpoint captures the state at step 2
    (not a later mutation) — VERDICT r3 #1 equality criterion."""
    import orbax.checkpoint as ocp

    import jax

    cfg_s = _config("cam", fixture_kwargs, tmp_path)
    cfg_s["output_dir"] = str(tmp_path / "serial")
    cfg_s.update(prefetch_batches=0, async_checkpointing=False,
                 record_loss_history=True)
    m_s = train("cam", cfg_s, max_steps_override=4)

    cfg_p = _config("cam", fixture_kwargs, tmp_path)
    cfg_p["output_dir"] = str(tmp_path / "pipelined")
    cfg_p.update(prefetch_batches=2, async_checkpointing=True,
                 ckpt_device_snapshot="always",  # pin the snapshot path
                 record_loss_history=True)
    m_p = train("cam", cfg_p, max_steps_override=4)

    np.testing.assert_array_equal(
        np.asarray(m_s["loss_history"]), np.asarray(m_p["loss_history"])
    )
    # the HBM-pressure fallback (blocking host fetch instead of a device
    # snapshot) must produce the same checkpoints too
    cfg_n = _config("cam", fixture_kwargs, tmp_path)
    cfg_n["output_dir"] = str(tmp_path / "no_snapshot")
    cfg_n.update(prefetch_batches=1, async_checkpointing=True,
                 ckpt_device_snapshot="never", record_loss_history=True)
    m_n = train("cam", cfg_n, max_steps_override=4)
    np.testing.assert_array_equal(
        np.asarray(m_s["loss_history"]), np.asarray(m_n["loss_history"])
    )

    ckptr = ocp.PyTreeCheckpointer()
    for step in (2, 4):
        t_s = ckptr.restore(os.path.join(m_s["run_dir"], "checkpoints", f"step-{step}"))
        t_p = ckptr.restore(os.path.join(m_p["run_dir"], "checkpoints", f"step-{step}"))
        t_n = ckptr.restore(os.path.join(m_n["run_dir"], "checkpoints", f"step-{step}"))
        ls, lp, ln = jax.tree.leaves(t_s), jax.tree.leaves(t_p), jax.tree.leaves(t_n)
        assert len(ls) == len(lp) == len(ln) > 0
        for a, b, c in zip(ls, lp, ln):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_preemption_checkpoints_and_resumes(fixture_kwargs, tmp_path):
    """SIGTERM mid-run -> the trainer finishes the in-flight step, writes a
    checkpoint, and exits 0 (the reference has no failure handling at all,
    SURVEY.md §5); `resume_from: auto` then continues from that exact step."""
    import signal
    import subprocess
    import sys

    from synfmc_tpu.config import save_config

    cfg = _config("cam", fixture_kwargs, tmp_path)
    cfg["output_dir"] = str(tmp_path / "out_pre")
    cfg["checkpointing_steps"] = -1  # only the preemption save may write
    cfg["max_train_steps"] = 500  # far more than we let it run
    cfg_path = str(tmp_path / "pre.yaml")
    save_config(cfg, cfg_path)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "scripts/train.py", "--stage", "cam", "--config", cfg_path],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        # wait until a few steps have logged, then preempt
        import time as _time

        deadline = _time.time() + 600
        logged = False
        while _time.time() < deadline and not logged:
            if proc.poll() is not None:
                _, err = proc.communicate()
                raise AssertionError(f"trainer died early: {err[-2000:]}")
            for log in glob.glob(os.path.join(cfg["output_dir"], "*", "log.txt")):
                if "step 3/" in open(log).read():
                    logged = True
                    break
            _time.sleep(1)
        assert logged, "trainer never reached step 3"
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate(timeout=30)
    assert proc.returncode == 0, err[-2000:]
    assert "'preempted': True" in out, out[-1000:]

    ckpts = glob.glob(os.path.join(cfg["output_dir"], "*", "checkpoints", "step-*"))
    assert ckpts, "preemption wrote no checkpoint"
    saved_step = max(int(os.path.basename(c)[5:]) for c in ckpts)
    assert saved_step >= 3

    # resume continues from the preempted step
    cfg2 = _config("cam", fixture_kwargs, tmp_path)
    cfg2["output_dir"] = cfg["output_dir"]
    cfg2["resume_from"] = "auto"
    m = train("cam", cfg2, max_steps_override=saved_step + 2)
    assert m["steps"] == saved_step + 2
    assert np.isfinite(m["loss"])


def test_empty_loader_raises_clear_error(fixture_kwargs, tmp_path):
    """batch_size > per-host dataset size must fail with a clear message,
    not an escaping StopIteration (found by the full-scale lora smoke)."""
    cfg = _config("cam", fixture_kwargs, tmp_path)
    cfg["train_batch_size"] = 4096
    with pytest.raises(ValueError, match="empty data loader"):
        train("cam", cfg, max_steps_override=1)


def test_train_honors_mesh_fsdp_knob(fixture_kwargs, tmp_path):
    """`mesh: {data: 4, fsdp: 2}` in the YAML must drive the production
    trainer's ZeRO-1 path end-to-end (VERDICT r2 weak #3): the run completes,
    losses are finite, and checkpoints are written from the sharded state."""
    cfg = _config("cam", fixture_kwargs, tmp_path)
    cfg["mesh"] = {"data": 4, "fsdp": 2}
    metrics = train("cam", cfg, max_steps_override=2)
    assert metrics["steps"] == 2
    assert np.isfinite(metrics["loss"])
    assert glob.glob(os.path.join(metrics["run_dir"], "checkpoints", "*.ckpt"))


def test_train_honors_mesh_sp_knob(fixture_kwargs, tmp_path):
    """`mesh: {data: 2, sp: 4}` shards the frame axis of training
    activations (the high-resolution HBM lever, PERF.md) end-to-end through
    the production trainer."""
    cfg = _config("cam", fixture_kwargs, tmp_path)
    cfg["train_batch_size"] = 2
    cfg["mesh"] = {"data": 2, "sp": 4}  # frames=4 split over sp
    metrics = train("cam", cfg, max_steps_override=2)
    assert metrics["steps"] == 2
    assert np.isfinite(metrics["loss"])


def test_epoch_denominated_knobs(fixture_kwargs, tmp_path):
    """max_train_steps: -1 resolves from max_train_epoch x len(loader), and
    checkpointing_steps: -1 from checkpointing_epochs x len(loader)
    (train_cam_ctrl.py:369-375)."""
    cfg = _config("cam", fixture_kwargs, tmp_path)
    cfg["max_train_steps"] = -1
    cfg["max_train_epoch"] = 2
    cfg["checkpointing_steps"] = -1
    cfg["checkpointing_epochs"] = 1
    metrics = train("cam", cfg)
    # fixture: 2 clips, batch 1 -> 2 batches/epoch -> 4 steps, ckpt every 2
    assert metrics["steps"] == 4
    run_dir = metrics["run_dir"]
    for step in (2, 4):
        assert os.path.isdir(os.path.join(run_dir, "checkpoints", f"step-{step}"))

    # both -1 and no epochs knob: reference asserts; we match with ValueError
    cfg2 = _config("cam", fixture_kwargs, tmp_path)
    cfg2["max_train_steps"] = -1
    cfg2["max_train_epoch"] = -1
    with pytest.raises(ValueError, match="max_train_epoch"):
        train("cam", cfg2)

    # with gradient accumulation the epoch knobs are in OPTIMIZER steps
    # (ADVICE r4: one step consumes `accum` batches, so 2 epochs of a 2-batch
    # loader with accum=2 is 2 steps, not 4 — and checkpointing_epochs: 1
    # fires every step, not every other)
    cfg3 = _config("cam", fixture_kwargs, tmp_path)
    cfg3["output_dir"] = str(tmp_path / "out_accum")
    cfg3["gradient_accumulation_steps"] = 2
    cfg3["max_train_steps"] = -1
    cfg3["max_train_epoch"] = 2
    cfg3["checkpointing_steps"] = -1
    cfg3["checkpointing_epochs"] = 1
    m3 = train("cam", cfg3)
    assert m3["steps"] == 2
    for step in (1, 2):
        assert os.path.isdir(os.path.join(m3["run_dir"], "checkpoints", f"step-{step}"))


def test_adam_hparams_reach_optimizer(fixture_kwargs, tmp_path, monkeypatch):
    """adam_beta1/beta2/epsilon from the config must reach make_optimizer
    (ADVICE r4: they were schema-legal and stamped into the exported torch
    optimizer param_groups, but training silently ran on the 0.9/0.999/1e-8
    defaults)."""
    import synfmc_tpu.training.trainers as trainers_mod

    captured = {}

    class _Captured(Exception):
        pass

    def fake_make_optimizer(lr, **kw):
        captured.update(kw, learning_rate=lr)
        raise _Captured

    monkeypatch.setattr(trainers_mod, "make_optimizer", fake_make_optimizer)
    cfg = _config("cam", fixture_kwargs, tmp_path)
    cfg["adam_beta1"] = 0.85
    cfg["adam_beta2"] = 0.97
    cfg["adam_epsilon"] = 1e-6
    with pytest.raises(_Captured):
        train("cam", cfg, max_steps_override=1)
    assert captured["adam_beta1"] == 0.85
    assert captured["adam_beta2"] == 0.97
    assert captured["adam_epsilon"] == 1e-6


def test_obj_bundle_partition(fixture_kwargs, tmp_path):
    """Stage-3 bundles partition the unet trainables like the reference
    (train_cam_obj_ctrl.py:948-980, ADVICE r4): the cmcm bundle carries ONLY
    merge params ('merge' in k and 'lora' not in k, :360-361), img-lora
    params get their own img-lora-step-N.ckpt (:972-980), and mm norm/proj
    params — trained but never persisted by the reference (quirk) — ride the
    omcm bundle's extra mm_state_dict key so nothing is lost."""
    from synfmc_tpu.training.checkpoint import torch_load_state_dict

    cfg = _config("obj", fixture_kwargs, tmp_path)
    cfg["train_cm"] = True
    cfg["train_mm"] = True
    cfg["train_image_lora"] = True
    metrics = train("obj", cfg, max_steps_override=2)
    ckdir = os.path.join(metrics["run_dir"], "checkpoints")

    cmcm = torch_load_state_dict(os.path.join(ckdir, "cmcm-step-2.ckpt"))
    attn = cmcm["attention_processor_state_dict"]
    assert attn, "train_cm run must export merge params"
    bad = [k for k in attn if "merge" not in k or "lora" in k]
    assert not bad, f"non-merge params leaked into cmcm bundle: {bad[:5]}"

    lora = torch_load_state_dict(os.path.join(ckdir, "img-lora-step-2.ckpt"))
    assert lora["lora_state_dict"], "train_image_lora run must write img-lora bundle"
    assert all("lora" in k for k in lora["lora_state_dict"])
    assert lora["global_step"] == 2

    omcm = torch_load_state_dict(os.path.join(ckdir, "omcm-step-2.ckpt"))
    mm = omcm["mm_state_dict"]
    assert mm, "train_mm params must be persisted (omcm mm_state_dict)"
    assert all("merge" not in k and "lora" not in k for k in mm)
    assert any("proj_in" in k for k in mm) and any("proj_out" in k for k in mm)

    # without the knobs: no cmcm/img-lora files, no mm_state_dict key —
    # the default stage-3 layout matches the reference's exactly
    cfg2 = _config("obj", fixture_kwargs, tmp_path)
    cfg2["output_dir"] = str(tmp_path / "out_plain")
    m2 = train("obj", cfg2, max_steps_override=2)
    ckdir2 = os.path.join(m2["run_dir"], "checkpoints")
    assert not os.path.exists(os.path.join(ckdir2, "cmcm-step-2.ckpt"))
    assert not os.path.exists(os.path.join(ckdir2, "img-lora-step-2.ckpt"))
    omcm2 = torch_load_state_dict(os.path.join(ckdir2, "omcm-step-2.ckpt"))
    assert "mm_state_dict" not in omcm2


def test_cam_train_mm(fixture_kwargs, tmp_path):
    """Stage-2 train_mm (train_cam_ctrl.py:286-305): the temporal
    transformers' norm/proj layers join the trainables and the bundle grows
    an mm_state_dict (train_cam_ctrl.py:679-683) separate from the merge
    params."""
    from synfmc_tpu.training.checkpoint import torch_load_state_dict

    cfg = _config("cam", fixture_kwargs, tmp_path)
    cfg["train_mm"] = True
    metrics = train("cam", cfg, max_steps_override=2)
    bundle_path = glob.glob(
        os.path.join(metrics["run_dir"], "checkpoints", "cmcm-step-2.ckpt")
    )[0]
    bundle = torch_load_state_dict(bundle_path)
    mm = bundle["mm_state_dict"]
    assert mm, "train_mm run must export mm_state_dict"
    assert all("motion_modules" in k for k in mm)
    assert any(".norm." in k or k.endswith("norm.weight") for k in mm)
    assert any("proj_in" in k for k in mm) and any("proj_out" in k for k in mm)
    # the merge params stay in their own key, with no mm leakage
    assert all("motion_modules" not in k or "merge" in k
               for k in bundle["attention_processor_state_dict"])
    # optimizer export covers encoder + merge + mm (reference order)
    n_mm = len(mm)
    opt = bundle["optimizer_state_dict"]
    assert len(opt["state"]) == len(opt["param_names"])
    assert sum(1 for name in opt["param_names"]
               if "motion_modules" in name and "merge" not in name) == n_mm

    # without train_mm the bundle must NOT carry mm_state_dict
    cfg2 = _config("cam", fixture_kwargs, tmp_path)
    m2 = train("cam", cfg2, max_steps_override=2)
    b2 = torch_load_state_dict(
        glob.glob(os.path.join(m2["run_dir"], "checkpoints", "cmcm-step-2.ckpt"))[0]
    )
    assert "mm_state_dict" not in b2


def test_obj_warm_start_from_omcm_bundle(fixture_kwargs, tmp_path):
    """omcm_config.pretrained warm-starts the adapter AND resumes the step
    count from the bundle's global_step (train_cam_obj_ctrl.py:296-313,
    574-578); optimizer state deliberately does NOT carry over (the
    reference quirk, SURVEY §5)."""
    cfg = _config("obj", fixture_kwargs, tmp_path)
    m1 = train("obj", cfg, max_steps_override=2)
    omcm_path = glob.glob(
        os.path.join(m1["run_dir"], "checkpoints", "omcm-step-2.ckpt")
    )[0]

    cfg2 = _config("obj", fixture_kwargs, tmp_path)
    cfg2["omcm_config"]["pretrained"] = omcm_path
    cfg2["record_loss_history"] = True
    m2 = train("obj", cfg2, max_steps_override=3)
    assert m2["steps"] == 3
    assert len(m2["loss_history"]) == 1  # resumed at 2, ran exactly one step
    assert np.isfinite(m2["loss"])


def test_gradient_accumulation_e2e(fixture_kwargs, tmp_path):
    """gradient_accumulation_steps: 2 consumes two loader batches per
    optimizer step (REAL accumulation — the reference's knob never
    accumulates, train_cam_obj_ctrl.py:486-487), and crash-resume arithmetic
    stays exact in batch units."""
    cfg = _config("cam", fixture_kwargs, tmp_path)
    cfg["output_dir"] = str(tmp_path / "out_a")
    cfg["gradient_accumulation_steps"] = 2
    cfg["record_loss_history"] = True
    m_a = train("cam", cfg, max_steps_override=3)
    assert m_a["steps"] == 3 and len(m_a["loss_history"]) == 3
    assert all(np.isfinite(v) for v in m_a["loss_history"])

    # crash at 2, resume to 3: the resumed step must consume the SAME two
    # batches (batch-unit divmod) and reproduce the uninterrupted loss
    cfg_b = _config("cam", fixture_kwargs, tmp_path)
    cfg_b["output_dir"] = str(tmp_path / "out_b")
    cfg_b["gradient_accumulation_steps"] = 2
    cfg_b["record_loss_history"] = True
    train("cam", cfg_b, max_steps_override=2)
    cfg_c = _config("cam", fixture_kwargs, tmp_path)
    cfg_c["output_dir"] = str(tmp_path / "out_b")
    cfg_c["gradient_accumulation_steps"] = 2
    cfg_c["record_loss_history"] = True
    cfg_c["resume_from"] = "auto"
    m_c = train("cam", cfg_c, max_steps_override=3)
    assert len(m_c["loss_history"]) == 1
    np.testing.assert_array_equal(
        np.asarray(m_a["loss_history"][2:]), np.asarray(m_c["loss_history"])
    )
