from synfmc_tpu.evaluation.metrics import (
    camera_errors_from_txt,
    psnr,
    rot_err_deg,
    trans_err,
)

__all__ = ["psnr", "rot_err_deg", "trans_err", "camera_errors_from_txt"]
