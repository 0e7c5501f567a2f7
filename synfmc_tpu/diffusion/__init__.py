from synfmc_tpu.diffusion.scheduler import DiffusionSchedule

__all__ = ["DiffusionSchedule"]
