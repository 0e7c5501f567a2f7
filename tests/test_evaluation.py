import numpy as np

from synfmc_tpu.evaluation import camera_errors_from_txt, psnr, rot_err_deg, trans_err
from synfmc_tpu.geometry import euler_to_matrix_v2
from synfmc_tpu.utils.video import save_camera_info_txt


def test_psnr():
    a = np.zeros((8, 8))
    assert psnr(a, a) == float("inf")
    b = a + 0.1
    assert abs(psnr(a, b) - 20.0) < 1e-6  # 10*log10(1/0.01)


def test_rot_err():
    r1 = euler_to_matrix_v2(0.0, 0.0, 0.0)
    r2 = euler_to_matrix_v2(0.0, 0.0, 30.0)
    assert abs(rot_err_deg(r1, r1)) < 1e-5
    assert abs(rot_err_deg(r1, r2) - 30.0) < 1e-4


def test_trans_err():
    t1 = np.array([[0.0, 0, 0], [1, 0, 0]])
    t2 = np.array([[0.0, 0, 0], [2, 0, 0]])
    e = trans_err(t1, t2, normalize=True)
    assert abs(e[1] - 0.5) < 1e-9  # normalized by gt extent 2


def test_camera_txt_roundtrip(tmp_path, rng):
    f = 4
    intr = np.tile(np.array([384.0, 256.0, 0, 0]), (f, 1))
    rts = []
    for i in range(f):
        m = np.zeros((3, 4))
        m[:, :3] = euler_to_matrix_v2(10.0 * i, 5.0, -3.0)
        m[:, 3] = [i, 2 * i, 0.5]
        rts.append(m)
    rts = np.stack(rts)
    p1 = str(tmp_path / "pred.txt")
    p2 = str(tmp_path / "gt.txt")
    save_camera_info_txt(p1, intr, rts)
    save_camera_info_txt(p2, intr, rts)
    errs = camera_errors_from_txt(p1, p2)
    assert errs["rot_err_deg_mean"] < 1e-4
    assert errs["trans_err_mean"] < 1e-9


def test_instantiate_from_config():
    from collections import OrderedDict

    from synfmc_tpu.utils.logger import instantiate_from_config

    obj = instantiate_from_config({"target": "collections.OrderedDict", "params": {}})
    assert isinstance(obj, OrderedDict)

    tok = instantiate_from_config({"target": "synfmc_tpu.data.tokenizer.HashTokenizer"})
    assert tok("hi").shape == (1, 77)
