import io

from synfmc_tpu.config import ConfigDict, load_config, loads_config


REF_STYLE_YAML = """
output_dir: "output/camctrl_model"
lora_rank: 2
train_data:
  params:
    sample_size: [256, 384]
    cam_translation_rescale_factor: 1200
noise_scheduler_kwargs:
  num_train_timesteps: 1000
  beta_start: 0.00085
  beta_schedule: "linear"
"""


def test_load_reference_style_config():
    cfg = loads_config(REF_STYLE_YAML)
    assert cfg.lora_rank == 2
    assert cfg.train_data.params.sample_size == [256, 384]
    assert cfg.get_path("noise_scheduler_kwargs.beta_start") == 0.00085
    assert cfg.get_path("missing.key", default=7) == 7


def test_splat_into_main():
    cfg = loads_config(REF_STYLE_YAML)

    def main(output_dir, lora_rank, **kw):
        return output_dir, lora_rank

    assert main(**cfg) == ("output/camctrl_model", 2)


def test_merge_and_roundtrip(tmp_path):
    cfg = ConfigDict({"a": {"b": 1, "c": 2}, "d": 3})
    merged = cfg.merged_with({"a": {"c": 9}, "e": 4})
    assert merged.a.b == 1 and merged.a.c == 9 and merged.e == 4
    assert cfg.a.c == 2  # original untouched

    from synfmc_tpu.config import save_config

    p = tmp_path / "cfg.yaml"
    save_config(merged, str(p))
    back = load_config(str(p))
    assert back.to_dict() == merged.to_dict()


def test_load_actual_reference_configs():
    for name in ("lora", "cam", "obj"):
        cfg = load_config(f"/root/reference/configs/{name}.yaml")
        assert "output_dir" in cfg
        assert cfg.get_path("noise_scheduler_kwargs.num_train_timesteps") == 1000
