"""Config-surface strictness: drop-in parity with the reference's
main(**config) TypeError behavior (train_cam_ctrl.py:797-806), extended to
the nested structural kwargs the rebuild pins statically."""

import os

import pytest

from synfmc_tpu.config import load_config, loads_config
from synfmc_tpu.training.config_schema import ConfigError, validate_config

REF_CONFIGS = "/root/reference/configs"


@pytest.mark.parametrize("stage", ["lora", "cam", "obj"])
def test_shipped_configs_validate(stage):
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..", "configs", f"{stage}.yaml"))
    validate_config(cfg, stage)  # must not raise


@pytest.mark.parametrize("stage", ["lora", "cam", "obj"])
@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference not present")
def test_reference_configs_validate_unchanged(stage):
    # the drop-in promise: the reference's own YAML passes key validation
    cfg = load_config(os.path.join(REF_CONFIGS, f"{stage}.yaml"))
    validate_config(cfg, stage)  # must not raise


def test_typo_raises_with_suggestion():
    cfg = loads_config("output_dir: /tmp\nlearning_rte: 1e-4\n")
    with pytest.raises(ConfigError) as e:
        validate_config(cfg, "lora")
    assert "learning_rte" in str(e.value)
    assert "learning_rate" in str(e.value)  # did-you-mean


def test_stage_scoped_keys():
    # omcm_config is an obj-stage key; on cam it is a typo
    cfg = loads_config("output_dir: /tmp\nomcm_config: {params: {}}\n")
    with pytest.raises(ConfigError):
        validate_config(cfg, "cam")
    validate_config(cfg, "obj")


def test_allow_unknown_downgrades_to_note():
    cfg = loads_config("output_dir: /tmp\nmy_extra: 1\nallow_unknown_config_keys: true\n")
    notes = validate_config(cfg, "lora")
    assert any("my_extra" in n for n in notes)


def test_inert_keys_note_not_error():
    cfg = loads_config("output_dir: /tmp\ntrain_unet: true\nis_debug: true\n")
    notes = validate_config(cfg, "cam")
    assert sum("inert" in n for n in notes) == 2


def test_add_spatial_rejected():
    cfg = loads_config(
        "output_dir: /tmp\nattention_processor_kwargs:\n  add_spatial: true\n"
    )
    with pytest.raises(ConfigError, match="add_spatial"):
        validate_config(cfg, "cam")


def test_query_condition_variant_rejected():
    cfg = loads_config(
        "output_dir: /tmp\nattention_processor_kwargs:\n  query_condition: false\n"
    )
    with pytest.raises(ConfigError, match="query"):
        validate_config(cfg, "cam")


def test_pose_feature_dimensions_must_match_channels():
    cfg = loads_config(
        "output_dir: /tmp\n"
        "attention_processor_kwargs:\n  pose_feature_dimensions: [64, 128]\n"
    )
    with pytest.raises(ConfigError, match="pose_feature_dimensions"):
        validate_config(cfg, "cam")
    ok = loads_config(
        "output_dir: /tmp\n"
        "model_overrides: {block_out_channels: [64, 128]}\n"
        "attention_processor_kwargs:\n  pose_feature_dimensions: [64, 128]\n"
    )
    validate_config(ok, "cam")


def test_pose_encoder_structural_booleans():
    cfg = loads_config("output_dir: /tmp\npose_encoder_kwargs:\n  use_conv: true\n")
    with pytest.raises(ConfigError, match="resblock"):
        validate_config(cfg, "cam")


def test_pose_encoder_cin_consistency():
    cfg = loads_config(
        "output_dir: /tmp\npose_encoder_kwargs:\n  downscale_factor: 8\n  cin: 128\n"
    )
    with pytest.raises(ConfigError, match="cin"):
        validate_config(cfg, "cam")
    ok = loads_config(
        "output_dir: /tmp\npose_encoder_kwargs:\n  downscale_factor: 8\n  cin: 384\n"
    )
    validate_config(ok, "cam")


def test_motion_module_dead_variants_rejected():
    cfg = loads_config(
        "output_dir: /tmp\nunet_additional_kwargs:\n"
        "  motion_module_kwargs:\n    attention_block_types: [Temporal_Cross]\n"
    )
    with pytest.raises(ConfigError, match="attention_block_types"):
        validate_config(cfg, "cam")
    cfg2 = loads_config(
        "output_dir: /tmp\nunet_additional_kwargs:\n  motion_module_type: Fancy\n"
    )
    with pytest.raises(ConfigError, match="motion_module_type"):
        validate_config(cfg2, "cam")


def test_scheduler_kwargs_strict_by_name():
    # a silently-dropped prediction_type would change the loss target
    cfg = loads_config(
        "output_dir: /tmp\nnoise_scheduler_kwargs:\n  prediction_type: v_prediction\n"
    )
    with pytest.raises(ConfigError, match="noise_scheduler_kwargs"):
        validate_config(cfg, "lora")


def test_nested_unknown_key_rejected():
    cfg = loads_config(
        "output_dir: /tmp\nattention_processor_kwargs:\n  scael: 2.0\n"
    )
    with pytest.raises(ConfigError, match="scael"):
        validate_config(cfg, "cam")


def test_omcm_params_checked():
    cfg = loads_config(
        "output_dir: /tmp\nomcm_config:\n  params: {cin: 64}\n"
    )
    with pytest.raises(ConfigError, match="832"):
        validate_config(cfg, "obj")


def test_gradient_accumulation_must_be_positive():
    cfg = loads_config("output_dir: /tmp\ngradient_accumulation_steps: 0\n")
    with pytest.raises(ConfigError, match="gradient_accumulation_steps"):
        validate_config(cfg, "lora")
