from synfmc_tpu.pipelines.animation import AnimationPipeline

__all__ = ["AnimationPipeline"]
