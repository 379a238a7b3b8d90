"""SAM2 automatic-mask-generator parity + e2e tests.

The math utilities are checked EXACTLY against the importable reference
functions (``/root/reference/torchao/_models/sam2/utils/amg.py`` — pure
torch/numpy, no torchvision needed); the AMG pipeline runs end-to-end
on a tiny random-weight SAM2Model, bf16 and int8wo-quantized.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.models import sam2_amg as amg
from torchao_tpu.models.sam2_modeling import SAM2Config, SAM2Model

sys.path.insert(0, "/root/reference")


def _stub(name, attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _ref_amg():
    torch = pytest.importorskip("torch")
    # the sam2 package __init__ pulls hydra/iopath (config machinery we
    # don't need) — stub them like tests/test_sam2_convert.py does
    try:
        import hydra  # noqa: F401
    except ImportError:
        h = _stub("hydra", {"initialize_config_module": lambda *a, **k: None})
        core = _stub("hydra.core", {})
        h.core = core

        class GH:
            _i = None

            @classmethod
            def instance(cls):
                if cls._i is None:
                    cls._i = cls()
                return cls._i

            def is_initialized(self):
                return True

        core.global_hydra = _stub(
            "hydra.core.global_hydra", {"GlobalHydra": GH}
        )
    try:
        import iopath  # noqa: F401
    except ImportError:
        _stub("iopath", {})
        _stub("iopath.common", {})
        _stub("iopath.common.file_io", {"g_pathmgr": None})
    from torchao._models.sam2.utils import amg as ref

    return torch, ref


# ---------------------------------------------------------------------------
# exact parity vs the reference math
# ---------------------------------------------------------------------------


def test_point_grid_parity():
    _, ref = _ref_amg()
    for n in (1, 4, 16, 32):
        np.testing.assert_allclose(
            amg.build_point_grid(n), ref.build_point_grid(n)
        )
    ours = amg.build_all_layer_point_grids(32, 2, 2)
    theirs = ref.build_all_layer_point_grids(32, 2, 2)
    assert len(ours) == len(theirs)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b)


def test_crop_boxes_parity():
    _, ref = _ref_amg()
    for size, layers, ratio in [
        ((600, 800), 0, 512 / 1500),
        ((600, 800), 2, 512 / 1500),
        ((333, 1024), 1, 0.25),
        ((1024, 1024), 3, 0.1),
    ]:
        b1, l1 = amg.generate_crop_boxes(size, layers, ratio)
        b2, l2 = ref.generate_crop_boxes(size, layers, ratio)
        assert b1 == b2 and l1 == l2, (size, layers)


def test_stability_score_parity():
    torch, ref = _ref_amg()
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(7, 33, 41)).astype(np.float32) * 3
    ours = np.asarray(
        amg.calculate_stability_score(jnp.asarray(logits), 0.0, 1.0)
    )
    theirs = ref.calculate_stability_score(
        torch.from_numpy(logits), 0.0, 1.0
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_batched_mask_to_box_parity():
    torch, ref = _ref_amg()
    rng = np.random.default_rng(1)
    masks = rng.random(size=(9, 25, 37)) > 0.8
    masks[3] = False  # empty mask -> [0,0,0,0]
    masks[5] = False
    masks[5, 10, 20] = True  # single pixel
    ours = np.asarray(amg.batched_mask_to_box(jnp.asarray(masks)))
    theirs = ref.batched_mask_to_box(torch.from_numpy(masks)).numpy()
    np.testing.assert_array_equal(ours, theirs)
    # leading batch dims preserved
    m4 = masks.reshape(3, 3, 25, 37)
    ours4 = np.asarray(amg.batched_mask_to_box(jnp.asarray(m4)))
    theirs4 = ref.batched_mask_to_box(torch.from_numpy(m4)).numpy()
    np.testing.assert_array_equal(ours4, theirs4)


def test_mask_to_rle_parity_and_roundtrip():
    torch, ref = _ref_amg()
    rng = np.random.default_rng(2)
    masks = rng.random(size=(6, 17, 23)) > 0.6
    masks[0] = True   # all-foreground
    masks[1] = False  # all-background
    ours = amg.mask_to_rle(masks)
    theirs = ref.mask_to_rle_pytorch(torch.from_numpy(masks))
    for a, b in zip(ours, theirs):
        assert a["size"] == b["size"]
        assert a["counts"] == b["counts"]
    for i, rle in enumerate(ours):
        np.testing.assert_array_equal(amg.rle_to_mask(rle), masks[i])
        assert amg.area_from_rle(rle) == int(masks[i].sum())
        np.testing.assert_array_equal(
            ref.rle_to_mask(rle), amg.rle_to_mask(rle)
        )


def test_uncrop_parity():
    torch, ref = _ref_amg()
    rng = np.random.default_rng(3)
    crop_box = [5, 7, 25, 30]
    masks = rng.random(size=(4, 23, 20)) > 0.5  # [B, y1-y0, x1-x0]
    ours = amg.uncrop_masks(masks, crop_box, 40, 50)
    theirs = ref.uncrop_masks(
        torch.from_numpy(masks), crop_box, 40, 50
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)

    # reference uncrop_boxes_xyxy/uncrop_points call .pin_memory()
    # (CUDA-only) — check against the exact offset math instead
    boxes = rng.random(size=(4, 4)).astype(np.float32) * 20
    np.testing.assert_allclose(
        amg.uncrop_boxes_xyxy(boxes, crop_box),
        boxes + np.asarray([5, 7, 5, 7], np.float32),
    )
    pts = rng.random(size=(4, 2)).astype(np.float32) * 20
    np.testing.assert_allclose(
        amg.uncrop_points(pts, crop_box),
        pts + np.asarray([5, 7], np.float32),
    )


def test_is_box_near_crop_edge_parity(monkeypatch):
    torch, ref = _ref_amg()
    # the reference routes through uncrop_boxes_xyxy, which calls
    # .pin_memory() (CUDA-only) — make it a no-op for CPU parity
    monkeypatch.setattr(
        torch.Tensor, "pin_memory", lambda self, *a, **k: self
    )
    boxes = np.asarray(
        [
            [0.0, 0.0, 50, 50],     # at crop corner == image corner
            [100, 5, 150, 60],      # near crop x1 edge only
            [30, 30, 60, 60],       # interior
            [0, 95, 40, 115],       # near crop y1, also near image?
        ],
        np.float32,
    )
    crop_box = [0, 0, 110, 120]
    orig_box = [0, 0, 300, 300]
    ours = amg.is_box_near_crop_edge(boxes, crop_box, orig_box)
    theirs = ref.is_box_near_crop_edge(
        torch.from_numpy(boxes), crop_box, orig_box
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_box_xyxy_to_xywh_parity():
    torch, ref = _ref_amg()
    box = np.asarray([3.0, 4.0, 10.0, 20.0])
    np.testing.assert_allclose(
        amg.box_xyxy_to_xywh(box),
        ref.box_xyxy_to_xywh(torch.from_numpy(box)).numpy(),
    )


def test_remove_small_regions_parity_vs_cv2():
    """Our scipy 8-connected implementation vs the reference cv2 one."""
    pytest.importorskip("cv2")
    _, ref = _ref_amg()
    rng = np.random.default_rng(4)
    # blobby mask: threshold of smoothed noise + pepper noise
    base = rng.random(size=(48, 48))
    from scipy import ndimage

    mask = ndimage.gaussian_filter(base, 3) > 0.5
    mask |= rng.random(size=(48, 48)) > 0.98  # small islands
    mask &= rng.random(size=(48, 48)) > 0.02  # small holes
    for mode in ("holes", "islands"):
        ours, ch1 = amg.remove_small_regions(mask.copy(), 8, mode)
        theirs, ch2 = ref.remove_small_regions(mask.copy(), 8, mode)
        assert ch1 == ch2
        np.testing.assert_array_equal(ours, theirs)


def test_nms_semantics():
    boxes = np.asarray(
        [
            [0, 0, 10, 10],
            [1, 1, 11, 11],    # IoU ~0.68 with first
            [0, 0, 10, 10],    # duplicate of first
            [50, 50, 60, 60],  # disjoint
        ],
        np.float32,
    )
    scores = np.asarray([0.9, 0.8, 0.7, 0.6], np.float32)
    # IoU(box0, box1) = 81/119 ~ 0.6807; IoU(box0, box2) = 1.0
    keep = amg.nms(boxes, scores, 0.5)
    assert keep.tolist() == [0, 3]
    keep = amg.nms(boxes, scores, 0.7)      # 0.6807 < 0.7 survives
    assert keep.tolist() == [0, 1, 3]
    keep = amg.nms(boxes, scores, 0.65)
    assert keep.tolist() == [0, 3]
    # batched: same boxes in different categories never suppress
    cats = np.asarray([0, 1, 0, 1])
    keep = amg.batched_nms(boxes, scores, cats, 0.5)
    assert keep.tolist() == [0, 1, 3]
    assert amg.batched_nms(
        np.zeros((0, 4)), np.zeros((0,)), np.zeros((0,)), 0.5
    ).tolist() == []


def test_nms_brute_force_random():
    rng = np.random.default_rng(5)
    xy = rng.random(size=(40, 2)) * 80
    wh = rng.random(size=(40, 2)) * 30 + 1
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.random(size=40).astype(np.float32)

    def brute(boxes, scores, thr):
        order = np.argsort(-scores, kind="stable")
        keep, dropped = [], set()
        for i in order:
            if i in dropped:
                continue
            keep.append(i)
            for j in order:
                if j not in dropped and j != i:
                    if amg.box_iou(boxes[i : i + 1], boxes[j : j + 1])[0, 0] > thr:
                        dropped.add(j)
        return keep

    for thr in (0.3, 0.5, 0.7):
        assert amg.nms(boxes, scores, thr).tolist() == brute(
            boxes, scores, thr
        )


# ---------------------------------------------------------------------------
# end-to-end AMG on a tiny model
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_model():
    cfg = SAM2Config()  # 256px, d_model 64 test scale
    model = SAM2Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def _synthetic_image(h=96, w=96):
    img = np.zeros((h, w, 3), np.uint8)
    img[:] = 40
    img[20:60, 25:70] = [200, 80, 60]   # a bright rectangle
    img[70:90, 5:30] = [30, 180, 220]   # a second object
    return img


def test_image_predictor_shapes(tiny_model):
    model, params = tiny_model
    pred = amg.SAM2ImagePredictor(model, params)
    img = _synthetic_image()
    pred.set_image(img)
    masks, iou = pred.predict(
        point_coords=np.asarray([[40.0, 40.0]]),
        point_labels=np.asarray([1]),
    )
    assert masks.shape == (1, 3, 96, 96) and masks.dtype == bool
    assert iou.shape == (1, 3)
    m1, i1 = pred.predict(
        point_coords=np.asarray([[40.0, 40.0]]),
        point_labels=np.asarray([1]),
        multimask_output=False,
    )
    assert m1.shape == (1, 1, 96, 96)
    # the selected mask is the argmax-iou one
    np.testing.assert_array_equal(m1[0, 0], masks[0, int(np.argmax(iou))])


def test_amg_generates_records(tiny_model):
    model, params = tiny_model
    gen = amg.SAM2AutomaticMaskGenerator(
        model, params,
        points_per_side=4,
        points_per_batch=6,     # forces a padded final batch (16 pts)
        pred_iou_thresh=0.0,    # random weights -> don't gate on quality
        stability_score_thresh=0.0,
        box_nms_thresh=0.95,
    )
    img = _synthetic_image()
    records = gen.generate(img)
    assert len(records) > 0
    r = records[0]
    assert set(r) >= {
        "segmentation", "area", "bbox", "predicted_iou",
        "point_coords", "stability_score", "crop_box",
    }
    seg = r["segmentation"]
    assert seg.shape == img.shape[:2] and seg.dtype == bool
    assert r["area"] == int(seg.sum())
    # bbox (xywh) consistent with the segmentation's extents
    ys, xs = np.where(seg)
    if len(ys):
        x, y, w, h = r["bbox"]
        assert x == xs.min() and y == ys.min()
        assert x + w == xs.max() and y + h == ys.max()


def test_amg_with_crops_and_quantized_model(tiny_model):
    model, params = tiny_model
    from torchao_tpu.quantization.quant_api import (
        Int8WeightOnlyConfig,
        quantize_,
    )

    def linear_filter(path, leaf):
        return (
            hasattr(leaf, "ndim") and leaf.ndim == 2
            and "weight" in path
            and leaf.shape[-1] % 32 == 0
            and leaf.shape[-2] % 32 == 0
        )

    qparams = quantize_(params, Int8WeightOnlyConfig(), linear_filter)
    gen = amg.SAM2AutomaticMaskGenerator(
        model, qparams,
        points_per_side=4,
        points_per_batch=16,
        pred_iou_thresh=0.0,
        stability_score_thresh=0.0,
        crop_n_layers=1,        # 1 + 4 crops
        crop_n_points_downscale_factor=2,
        box_nms_thresh=0.95,
        crop_nms_thresh=0.95,
        output_mode="uncompressed_rle",
    )
    img = _synthetic_image(80, 112)
    records = gen.generate(img)
    assert len(records) > 0
    for r in records:
        assert r["segmentation"]["size"] == [80, 112]
        assert r["area"] == amg.area_from_rle(r["segmentation"])


def test_postprocess_small_regions():
    # two masks: one with a small hole + island, one clean duplicate
    h = w = 32
    m1 = np.zeros((h, w), bool)
    m1[4:28, 4:28] = True
    m1[10:12, 10:12] = False     # small hole
    m1[0:2, 30:32] = True        # small island
    m2 = np.zeros((h, w), bool)
    m2[4:28, 4:28] = True
    rles = amg.mask_to_rle(np.stack([m1, m2]))
    data = amg.MaskData(
        rles=rles,
        boxes=np.asarray(
            amg.batched_mask_to_box(jnp.asarray(np.stack([m1, m2])))
        ).astype(np.float32),
        iou_preds=np.asarray([0.9, 0.8], np.float32),
        points=np.zeros((2, 2), np.float32),
        stability_score=np.ones(2, np.float32),
        crop_boxes=np.asarray([[0, 0, w, h]] * 2, np.float32),
    )
    out = amg.SAM2AutomaticMaskGenerator.postprocess_small_regions(
        data, min_area=8, nms_thresh=0.7
    )
    # the two masks become identical after cleanup -> NMS keeps one,
    # preferring the UNCHANGED one (score 1)
    assert len(out) == 1
    kept = amg.rle_to_mask(out["rles"][0])
    np.testing.assert_array_equal(kept, m2)
