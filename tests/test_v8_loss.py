"""TAL assigner + v8 det/seg loss: behavioral tests (fixed-shape, padding-safe)."""

import numpy as np
import jax
import jax.numpy as jnp

from yolou_tpu.losses.tal import task_aligned_assign
from yolou_tpu.losses.v8 import LossHyp, v8_loss
from yolou_tpu.ops.boxes import make_anchors

NC = 2
REG_MAX = 16
SHAPES = [(8, 8), (4, 4), (2, 2)]
STRIDES = (8, 16, 32)
IMG = 64
A = sum(h * w for h, w in SHAPES)


def make_raw(rng, b=2, good_box=None, good_cls=0):
    """Random raw maps; optionally bias them to predict `good_box` (xyxy px).

    good_box may be one (x1,y1,x2,y2) tuple or a list of disjoint boxes."""
    boxes = ([] if good_box is None
             else [good_box] if not isinstance(good_box, list) else good_box)
    raw = []
    for (h, w), s in zip(SHAPES, STRIDES):
        r = rng.normal(0, 0.5, size=(b, h, w, 4 * REG_MAX + NC)).astype(np.float32)
        r[..., 4 * REG_MAX:] -= 4.0  # low cls logits everywhere
        for x1, y1, x2, y2 in boxes:
            for yy in range(h):
                for xx in range(w):
                    ax, ay = (xx + 0.5) * s, (yy + 0.5) * s
                    if x1 < ax < x2 and y1 < ay < y2:
                        d = np.array([ax - x1, ay - y1, x2 - ax, y2 - ay]) / s
                        for side in range(4):
                            bins = np.full(REG_MAX, -8.0)
                            t = int(round(min(d[side], REG_MAX - 1.01)))
                            bins[t] = 8.0
                            r[:, yy, xx, side * REG_MAX:(side + 1) * REG_MAX] = bins
                        r[:, yy, xx, 4 * REG_MAX + good_cls] = 6.0
        raw.append(jnp.asarray(r))
    return tuple(raw)


def make_targets(box_xyxy, g=4, b=2, cls_id=0, hm=16, wm=16):
    bboxes = np.zeros((b, g, 4), np.float32)
    cls = np.zeros((b, g), np.int32)
    valid = np.zeros((b, g), bool)
    masks = np.zeros((b, g, hm, wm), np.float32)
    x1, y1, x2, y2 = box_xyxy
    cx, cy, w, h = (x1 + x2) / 2 / IMG, (y1 + y2) / 2 / IMG, (x2 - x1) / IMG, (y2 - y1) / IMG
    bboxes[:, 0] = [cx, cy, w, h]
    cls[:, 0] = cls_id
    valid[:, 0] = True
    masks[:, 0, int(y1 * hm / IMG):int(y2 * hm / IMG),
          int(x1 * wm / IMG):int(x2 * wm / IMG)] = 1.0
    return {"bboxes": jnp.asarray(bboxes), "cls": jnp.asarray(cls),
            "valid": jnp.asarray(valid), "masks": jnp.asarray(masks)}


def test_assigner_picks_anchors_inside_box(rng):
    box = (8.0, 8.0, 40.0, 40.0)
    raw = make_raw(rng, good_box=box)
    anchors, stride_t = make_anchors(SHAPES, STRIDES, 0.5)
    scores = jnp.full((2, A, NC), 0.3)
    # decoded boxes: every anchor predicts the gt box => overlap metric peaks inside
    pb = jnp.tile(jnp.asarray(box, jnp.float32)[None, None], (2, A, 1))
    gt = jnp.asarray(np.tile(np.asarray(box, np.float32)[None, None], (2, 4, 1)))
    valid = jnp.zeros((2, 4), bool).at[:, 0].set(True)
    res = task_aligned_assign(scores, pb, anchors * stride_t,
                              jnp.zeros((2, 4), jnp.int32), gt, valid)
    fg = np.asarray(res.fg_mask)
    assert fg.sum() > 0
    pts = np.asarray(anchors * stride_t)
    inside = (pts[:, 0] > box[0]) & (pts[:, 0] < box[2]) & \
             (pts[:, 1] > box[1]) & (pts[:, 1] < box[3])
    assert not np.any(fg[0] & ~inside)  # no fg anchors outside the box


def test_loss_lower_for_good_predictions(rng):
    box = (8.0, 8.0, 40.0, 40.0)
    targets = make_targets(box)
    nm, hm, wm = 8, 16, 16
    protos = jnp.asarray(rng.normal(0, 0.1, size=(2, hm, wm, nm)), jnp.float32)
    gt_mask_logit = (np.asarray(targets["masks"][:, 0]) * 2 - 1) * 6
    protos = protos.at[..., 0].set(jnp.asarray(gt_mask_logit))
    good_coefs = jnp.zeros((2, A, nm)).at[..., 0].set(1.0)
    bad_coefs = jnp.asarray(rng.normal(0, 1.0, size=(2, A, nm)), jnp.float32)

    good_raw = make_raw(rng, good_box=box)
    good = v8_loss(good_raw, good_coefs, protos, targets,
                   nc=NC, strides=STRIDES)
    bad = v8_loss(make_raw(rng), bad_coefs, protos, targets,
                  nc=NC, strides=STRIDES)
    # box/seg parts must reward accurate boxes and masks
    for k in ("box", "seg"):
        assert float(good.parts[k]) < float(bad.parts[k]), k
    # cls: confidently-wrong (high logits everywhere) must cost more than good
    wrong_raw = tuple(r.at[..., 4 * REG_MAX:].set(6.0) for r in good_raw)
    wrong = v8_loss(wrong_raw, good_coefs, protos, targets, nc=NC, strides=STRIDES)
    assert float(good.parts["cls"]) < float(wrong.parts["cls"])
    assert np.isfinite(float(bad.total))


def test_padding_invariance(rng):
    box = (8.0, 8.0, 40.0, 40.0)
    raw = make_raw(rng, good_box=box)
    coefs = jnp.asarray(rng.normal(size=(2, A, 8)), jnp.float32)
    protos = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    t4 = make_targets(box, g=4)
    t16 = make_targets(box, g=16)
    l4 = v8_loss(raw, coefs, protos, t4, nc=NC, strides=STRIDES)
    l16 = v8_loss(raw, coefs, protos, t16, nc=NC, strides=STRIDES)
    np.testing.assert_allclose(float(l4.total), float(l16.total), rtol=1e-5)


def test_no_gt_image_finite(rng):
    raw = make_raw(rng)
    coefs = jnp.asarray(rng.normal(size=(2, A, 8)), jnp.float32)
    protos = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    t = make_targets((8, 8, 40, 40))
    t["valid"] = jnp.zeros_like(t["valid"])
    out = v8_loss(raw, coefs, protos, t, nc=NC, strides=STRIDES)
    assert np.isfinite(float(out.total))
    assert float(out.parts["box"]) == 0.0


def test_gradients_finite(rng):
    box = (8.0, 8.0, 40.0, 40.0)
    targets = make_targets(box)
    raw = make_raw(rng, good_box=box)
    coefs = jnp.asarray(rng.normal(size=(2, A, 8)), jnp.float32)
    protos = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)

    def f(raw, coefs, protos):
        return v8_loss(raw, coefs, protos, targets, nc=NC, strides=STRIDES).total

    grads = jax.grad(f, argnums=(0, 1, 2))(raw, coefs, protos)
    for gleaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(gleaf)))


def test_seg_cap_covers_all_positives(rng):
    """With >64 fg anchors the default max_pos (TAL budget G*topk) must equal
    the explicitly-uncapped computation — the old silent top-64 cap dropped
    mask gradients (VERDICT weak #2; reference loop has no cap,
    custom_v8_segmentation_loss.py:229-240)."""
    from yolou_tpu.ops.boxes import dfl_decode, dist2bbox
    boxes = [(float(x), float(y), float(x + 16), float(y + 16))
             for x in (0, 16, 32, 48) for y in (0, 16, 32, 48)]
    raw = make_raw(rng, good_box=boxes)
    # make_raw's one-hot rounding gives P4 anchors (d = 0.5 strides per side)
    # degenerate zero-width boxes -> align metric 0 -> TAL drops them. Write
    # two-hot bins (0 and 1) instead: DFL expectation 0.5 strides = exactly
    # the enclosing GT box, so all 16 P4 anchors assign too (64+16 = 80 fg).
    p4 = np.array(raw[1])
    for side in range(4):
        p4[..., side * REG_MAX:(side + 1) * REG_MAX] = -8.0
        p4[..., side * REG_MAX] = 8.0
        p4[..., side * REG_MAX + 1] = 8.0
    p4[..., 4 * REG_MAX] = 6.0
    p4[..., 4 * REG_MAX + 1:] = -4.0
    raw = (raw[0], jnp.asarray(p4), raw[2])
    g = len(boxes)
    hm = wm = 16
    bboxes = np.zeros((2, g, 4), np.float32)
    cls = np.zeros((2, g), np.int32)
    valid = np.ones((2, g), bool)
    masks = np.zeros((2, g, hm, wm), np.float32)
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        bboxes[:, i] = [(x1 + x2) / 2 / IMG, (y1 + y2) / 2 / IMG,
                        (x2 - x1) / IMG, (y2 - y1) / IMG]
        masks[:, i, int(y1 * hm / IMG):int(y2 * hm / IMG),
              int(x1 * wm / IMG):int(x2 * wm / IMG)] = 1.0
    t = {"bboxes": jnp.asarray(bboxes), "cls": jnp.asarray(cls),
         "valid": jnp.asarray(valid), "masks": jnp.asarray(masks)}
    coefs = jnp.asarray(rng.normal(size=(2, A, 8)), jnp.float32)
    protos = jnp.asarray(rng.normal(size=(2, hm, wm, 8)), jnp.float32)

    # count foreground anchors the way v8_loss does
    from yolou_tpu.losses.v8 import _flatten_raw
    from yolou_tpu.ops.boxes import xywh2xyxy
    pd, ps = _flatten_raw(raw, NC, REG_MAX)
    anchors, stride_t = make_anchors(SHAPES, STRIDES, 0.5)
    pb = dist2bbox(dfl_decode(pd.astype(jnp.float32), REG_MAX), anchors[None],
                   xywh=False)
    gt_xyxy = xywh2xyxy(t["bboxes"]) * IMG
    assign = task_aligned_assign(jax.nn.sigmoid(ps.astype(jnp.float32)),
                                 pb * stride_t[None], anchors * stride_t,
                                 t["cls"], gt_xyxy, t["valid"])
    n_fg = int(np.asarray(assign.fg_mask).sum(axis=1).max())
    assert n_fg > 64, f"scenario must exceed the old cap (got {n_fg})"

    l_default = v8_loss(raw, coefs, protos, t, nc=NC, strides=STRIDES)
    l_uncapped = v8_loss(raw, coefs, protos, t, nc=NC, strides=STRIDES,
                         max_pos=A)
    np.testing.assert_allclose(float(l_default.parts["seg"]),
                               float(l_uncapped.parts["seg"]), rtol=1e-6)
    # and the old 64 cap really would have changed the value
    l_capped = v8_loss(raw, coefs, protos, t, nc=NC, strides=STRIDES,
                       max_pos=64)
    assert abs(float(l_capped.parts["seg"])
               - float(l_uncapped.parts["seg"])) > 1e-6


def test_detect_only_mode(rng):
    raw = make_raw(rng)
    t = make_targets((8, 8, 40, 40))
    out = v8_loss(raw, None, None, t, nc=NC, strides=STRIDES, with_masks=False)
    assert float(out.parts["seg"]) == 0.0
    assert np.isfinite(float(out.total))


def test_seg_budget_follows_tal_topk(rng):
    """Raising the assigner's topk must raise the mask-term positive budget
    with it (VERDICT r2 weak #7: the budget hardcoded topk=10, so tal_topk=16
    silently dropped positives past G*10). Two half-image GTs at topk=16
    yield up to 32 positives; the old G*10=20 budget would truncate them."""
    boxes = [(0.0, 0.0, 32.0, 64.0), (32.0, 0.0, 64.0, 64.0)]
    raw = make_raw(rng, good_box=boxes)
    coefs = jnp.asarray(rng.normal(size=(2, A, 8)), jnp.float32)
    protos = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    g, hm, wm = 2, 16, 16
    bboxes = np.zeros((2, g, 4), np.float32)
    cls = np.zeros((2, g), np.int32)
    valid = np.ones((2, g), bool)
    masks = np.zeros((2, g, hm, wm), np.float32)
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        bboxes[:, i] = [(x1 + x2) / 2 / IMG, (y1 + y2) / 2 / IMG,
                        (x2 - x1) / IMG, (y2 - y1) / IMG]
        masks[:, i, int(y1 * hm / IMG):int(y2 * hm / IMG),
              int(x1 * wm / IMG):int(x2 * wm / IMG)] = 1.0
    t = {"bboxes": jnp.asarray(bboxes), "cls": jnp.asarray(cls),
         "valid": jnp.asarray(valid), "masks": jnp.asarray(masks)}

    # sanity: the scenario really produces more positives than G*10
    from yolou_tpu.ops.boxes import dfl_decode, dist2bbox
    pred_distri, pred_scores = raw[0].reshape(2, -1, 4 * REG_MAX + NC), None
    anchors, stride_t = make_anchors(SHAPES, STRIDES, 0.5)
    flat = jnp.concatenate([r.reshape(2, -1, r.shape[-1]) for r in raw], 1)
    dist = dfl_decode(flat[..., :4 * REG_MAX], REG_MAX)
    pb = dist2bbox(dist, anchors[None], xywh=False) * stride_t[None]
    res = task_aligned_assign(
        jax.nn.sigmoid(flat[..., 4 * REG_MAX:]), pb, anchors * stride_t,
        t["cls"], jnp.asarray([[list(b) for b in boxes]] * 2, jnp.float32),
        t["valid"], topk=16)
    n_fg = int(np.asarray(res.fg_mask).sum(axis=1).max())
    assert n_fg > g * 10, f"scenario too weak: {n_fg} fg anchors"

    out_default = v8_loss(raw, coefs, protos, t, nc=NC, strides=STRIDES,
                          tal_topk=16)
    out_uncapped = v8_loss(raw, coefs, protos, t, nc=NC, strides=STRIDES,
                           tal_topk=16, max_pos=A)
    np.testing.assert_allclose(float(out_default.parts["seg"]),
                               float(out_uncapped.parts["seg"]), rtol=1e-6)
