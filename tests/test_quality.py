"""Quality-metric harness tests (VERDICT round 1, item 7): metric
correctness on known cases + the end-to-end scoring path on the tiny model."""

import numpy as np

from sdmatte_tpu.eval import sad, mse, grad_error, conn_error, evaluate
from sdmatte_tpu.eval.synthetic import make_eval_set, trimap_from_alpha


def _disk(h=64, w=64, r=20, soft=6):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    d = np.sqrt((yy - h / 2) ** 2 + (xx - w / 2) ** 2)
    return np.clip((r + soft - d) / (2 * soft), 0.0, 1.0)


def test_metrics_zero_on_identical():
    a = _disk()
    tri = trimap_from_alpha(a.astype(np.float32))
    m = evaluate(a, a, tri)
    assert m == {"SAD": 0.0, "MSE": 0.0, "Grad": 0.0, "Conn": 0.0}


def test_sad_known_value():
    gt = np.zeros((10, 10))
    pred = np.full((10, 10), 0.5)
    assert abs(sad(pred, gt) - 0.5 * 100 / 1000.0) < 1e-12


def test_mse_unknown_region_only():
    gt = np.zeros((10, 10))
    pred = np.ones((10, 10))
    tri = np.zeros((10, 10))
    tri[:5] = 0.5                      # unknown half
    # error restricted to the unknown region; it is 1.0 there
    assert abs(mse(pred, gt, tri) - 1.0) < 1e-12
    # and fully-known trimap contributes nothing
    tri2 = np.zeros((10, 10))
    assert mse(pred, gt, tri2) == 0.0


def test_grad_detects_edge_blur():
    a = _disk(soft=2)
    blurred = _disk(soft=10)
    assert grad_error(blurred, a) > grad_error(a, a)


def test_conn_penalizes_disconnected_speckle():
    gt = _disk()
    speckle = gt.copy()
    # disconnected fully-opaque islands in the background
    speckle[2:6, 2:6] = 1.0
    speckle[2:6, 56:60] = 1.0
    assert conn_error(speckle, gt) > conn_error(gt, gt)


def test_synthetic_set_shapes_and_composition():
    cases = make_eval_set(96)
    assert [c["name"] for c in cases] == ["soft_disk", "hair",
                                          "gradient_band", "blob"]
    for c in cases:
        assert c["image"].shape == (96, 96, 3)
        assert c["alpha_gt"].shape == (96, 96)
        assert 0.0 <= c["image"].min() and c["image"].max() <= 1.0
        tri = c["trimap"]
        assert set(np.unique(tri)).issubset({0.0, 0.5, 1.0})
        # ground truth is binary wherever the trimap claims fg/bg
        assert np.all(c["alpha_gt"][tri == 1.0] > 1 - 1 / 255)
        assert np.all(c["alpha_gt"][tri == 0.0] < 1 / 255)


def test_tiny_model_quality_harness_end_to_end(rng):
    """The whole scoring path runs on the tiny model and yields finite
    metrics (random weights: numbers characterize the harness, not quality)."""
    from sdmatte_tpu.configs import SDMatteConfig
    from sdmatte_tpu.models import sdmatte
    from sdmatte_tpu.pipeline import MattingPipeline, PipelineOptions

    cfg = SDMatteConfig.tiny()
    pipe = MattingPipeline(sdmatte.init(cfg, seed=0), cfg, attn_impl="xla")
    opts = PipelineOptions(inference_size=64, mask_refine=True)
    case = make_eval_set(96)[0]
    alpha, _ = pipe(case["image"], case["trimap"], options=opts)
    m = evaluate(np.asarray(alpha)[0], case["alpha_gt"], case["trimap"])
    assert all(np.isfinite(v) for v in m.values())
    # perfect prediction would be strictly better on SAD than random weights
    assert m["SAD"] > 0.0
