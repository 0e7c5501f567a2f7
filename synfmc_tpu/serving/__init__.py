from synfmc_tpu.serving.batcher import Job, MicroBatcher

__all__ = ["Job", "MicroBatcher"]
