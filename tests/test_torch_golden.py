"""Golden fidelity tests against installed torch (VERDICT round-1 item 3).

Every test here compares framework numerics against *torch* computations —
the stack the reference actually runs on — rather than self-referential
checks. The torch modules below are written to ultralytics semantics and
*literal ultralytics state_dict naming* (Conv.conv/bn, GhostBottleneck's
3-slot `conv` Sequential with nn.Identity at conv.1, AAttn qkv/pe/proj,
A2C2f m.i.j + gamma), so the converter path is exercised against real torch
module trees, not names fabricated from our own mapping.

Parity points: /root/reference/nms.py:239-296 (greedy NMS),
YOLOSegPlusPlus.py:155 (bilinear upsample), train.py:267-269 (AdamW+cosine),
custom_v8_segmentation_loss.py:147 (BCE-with-logits).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn as tnn

from yolou_tpu.losses.dice import bce_with_logits, soft_dice_loss, tversky_loss
from yolou_tpu.nn.attention import A2C2f
from yolou_tpu.nn.blocks import (C3Ghost, ConvBNAct, upsample2x,
                                 upsample_bilinear_torch)
from yolou_tpu.ops.nms import non_max_suppression
from yolou_tpu.tools.torch2jax import convert_state_dict

torch.manual_seed(0)


# --------------------------------------------------------------------------
# torch modules with literal ultralytics structure/naming
# --------------------------------------------------------------------------

def _autopad(k):
    return k // 2


class TConv(tnn.Module):
    """ultralytics Conv: conv (no bias) + BatchNorm2d(eps 1e-3, mom .03) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, _autopad(k), groups=g, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU() if act else tnn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TGhostConv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1, act=True):
        super().__init__()
        c_ = c2 // 2
        self.cv1 = TConv(c1, c_, k, s, 1, act)
        self.cv2 = TConv(c_, c_, 5, 1, c_, act)

    def forward(self, x):
        y = self.cv1(x)
        return torch.cat([y, self.cv2(y)], 1)


class TGhostBottleneck(tnn.Module):
    """Stride-1 GhostBottleneck: conv.1 is nn.Identity (the mapping the
    round-1 converter got wrong — ghost2 must land at conv.2)."""

    def __init__(self, c1, c2):
        super().__init__()
        c_ = c2 // 2
        self.conv = tnn.Sequential(
            TGhostConv(c1, c_, 1, 1),
            tnn.Identity(),
            TGhostConv(c_, c2, 1, 1, act=False),
        )
        self.shortcut = tnn.Identity()

    def forward(self, x):
        return self.conv(x) + self.shortcut(x)


class TC3Ghost(tnn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c1, c_, 1, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = tnn.Sequential(*(TGhostBottleneck(c_, c_) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat([self.m(self.cv1(x)), self.cv2(x)], 1))


class TAAttn(tnn.Module):
    """ultralytics v12 area attention (head-major-interleaved qkv layout)."""

    def __init__(self, dim, num_heads, area=1):
        super().__init__()
        self.area = area
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.qkv = TConv(dim, dim * 3, 1, act=False)
        self.proj = TConv(dim, dim, 1, act=False)
        self.pe = TConv(dim, dim, 7, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        hd = self.head_dim
        qkv = self.qkv(x).flatten(2).transpose(1, 2)        # (B, N, 3C)
        if self.area > 1:
            qkv = qkv.reshape(B * self.area, N // self.area, C * 3)
            B, N, _ = qkv.shape
        q, k, v = (qkv.view(B, N, self.num_heads, hd * 3)
                   .permute(0, 2, 3, 1)                     # (B, h, 3hd, N)
                   .split([hd, hd, hd], dim=2))
        attn = (q.transpose(-2, -1) @ k) * (hd ** -0.5)     # (B, h, N, N)
        attn = attn.softmax(dim=-1)
        o = v @ attn.transpose(-2, -1)                      # (B, h, hd, N)
        o = o.permute(0, 3, 1, 2)                           # (B, N, h, hd)
        v = v.permute(0, 3, 1, 2)
        if self.area > 1:
            o = o.reshape(B // self.area, N * self.area, C)
            v = v.reshape(B // self.area, N * self.area, C)
            B, N, _ = o.shape
        o = o.reshape(B, H, W, C).permute(0, 3, 1, 2).contiguous()
        v = v.reshape(B, H, W, C).permute(0, 3, 1, 2).contiguous()
        return self.proj(o + self.pe(v))


class TABlock(tnn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=2.0, area=1):
        super().__init__()
        self.attn = TAAttn(dim, num_heads, area)
        h = int(dim * mlp_ratio)
        self.mlp = tnn.Sequential(TConv(dim, h, 1), TConv(h, dim, 1, act=False))

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.mlp(x)


class TA2C2f(tnn.Module):
    def __init__(self, c1, c2, n=1, area=1, residual=True, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv((1 + n) * c_, c2, 1)
        self.gamma = tnn.Parameter(0.01 * torch.ones(c2))
        self.residual = residual
        self.m = tnn.ModuleList(
            tnn.Sequential(*(TABlock(c_, max(1, c_ // 32), 2.0, area)
                             for _ in range(2)))
            for _ in range(n))

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(m(y[-1]) for m in self.m)
        out = self.cv2(torch.cat(y, 1))
        if self.residual:
            return x + self.gamma.view(1, -1, 1, 1) * out
        return out


def _randomize(module):
    """Random params + random (positive-var) BN running stats, eval mode."""
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.5)
    module.eval()
    return module


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()
            if not k.endswith("num_batches_tracked")}


def _compare(tmod, jmod, c_in, hw=8, atol=2e-5):
    x = torch.randn(2, c_in, hw, hw, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        want = tmod(x).numpy()
    template = jmod.init(jax.random.key(0),
                         jnp.zeros((2, hw, hw, c_in)), train=False)
    variables, report = convert_state_dict(_sd(tmod),
                                           jax.device_get(template),
                                           strict=True)
    assert not report["unused"], report["unused"][:8]
    got = np.asarray(jmod.apply(variables, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)), train=False)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


# --------------------------------------------------------------------------
# converter + forward golden tests
# --------------------------------------------------------------------------

def test_golden_conv_bn_silu():
    t = _randomize(TConv(4, 8, k=3, s=2))
    _compare(t, ConvBNAct(8, 3, 2), 4)


def test_golden_c3ghost_literal_names():
    t = _randomize(TC3Ghost(8, 8, n=2))
    # the literal ultralytics key set includes conv.2 (ghost2), never conv.1
    keys = set(_sd(t))
    assert "m.0.conv.2.cv1.conv.weight" in keys
    assert not any(".conv.1." in k for k in keys)
    _compare(t, C3Ghost(8, n=2), 8)


def test_golden_a2c2f_area_attention():
    t = _randomize(TA2C2f(64, 64, n=1, area=2, residual=True))
    keys = set(_sd(t))
    assert "m.0.0.attn.qkv.conv.weight" in keys and "gamma" in keys
    _compare(t, A2C2f(64, n=1, a2=True, area=2, residual=True), 64,
             atol=5e-5)


# --------------------------------------------------------------------------
# op-level goldens
# --------------------------------------------------------------------------

def test_golden_bilinear_upsample():
    x = torch.randn(2, 5, 9, 7, generator=torch.Generator().manual_seed(1))
    want = torch.nn.functional.interpolate(
        x, size=(17, 20), mode="bilinear", align_corners=False).numpy()
    got = np.asarray(upsample_bilinear_torch(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), (17, 20)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


def test_golden_nearest_upsample():
    x = torch.randn(1, 3, 5, 5)
    want = torch.nn.functional.interpolate(x, scale_factor=2,
                                           mode="nearest").numpy()
    got = np.asarray(upsample2x(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=0)


def test_golden_bce_with_logits():
    g = torch.Generator().manual_seed(2)
    logits = torch.randn(4, 33, generator=g) * 5
    target = torch.rand(4, 33, generator=g)
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, target, reduction="none").numpy()
    got = np.asarray(bce_with_logits(jnp.asarray(logits.numpy()),
                                     jnp.asarray(target.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_golden_soft_dice_and_tversky():
    g = torch.Generator().manual_seed(4)
    logits = torch.randn(2, 1, 16, 16, generator=g)
    target = (torch.rand(2, 1, 16, 16, generator=g) > 0.5).float()
    p = torch.sigmoid(logits)
    # MONAI DiceLoss(sigmoid=True, soft_label=True, batch=True) semantics
    inter = torch.minimum(p, target).sum()
    dice = (2 * inter + 1e-5) / (p.sum() + target.sum() + 1e-5)
    want = float(1 - dice)
    got = float(soft_dice_loss(jnp.asarray(logits.numpy()),
                               jnp.asarray(target.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # reference TverskyLoss (alpha=.4 FP, beta=.6 FN, smooth=1)
    tp = (p * target).sum()
    fp = ((1 - target) * p).sum()
    fn = (target * (1 - p)).sum()
    want_t = float(1 - (tp + 1) / (tp + 0.4 * fp + 0.6 * fn + 1))
    got_t = float(tversky_loss(jnp.asarray(logits.numpy()),
                               jnp.asarray(target.numpy())))
    np.testing.assert_allclose(got_t, want_t, rtol=1e-5)


# --------------------------------------------------------------------------
# greedy NMS keep-set parity vs a torch reference implementation
# --------------------------------------------------------------------------

def _torch_box_iou(a, b, eps=1e-7):
    tl = torch.maximum(a[:, None, :2], b[None, :, :2])
    br = torch.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = (br - tl).clamp(0).prod(-1)
    area_a = (a[:, 2:] - a[:, :2]).prod(-1)
    area_b = (b[:, 2:] - b[:, :2]).prod(-1)
    return inter / (area_a[:, None] + area_b[None, :] - inter + eps)


def _torch_greedy_nms(boxes, scores, iou_thres):
    """Sequential sorted greedy loop — /root/reference/nms.py:239-296 behavior."""
    order = scores.argsort(descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0]
        keep.append(int(i))
        if order.numel() == 1:
            break
        rest = order[1:]
        iou = _torch_box_iou(boxes[i][None], boxes[rest])[0]
        order = rest[iou <= iou_thres]
    return keep


def test_golden_nms_keep_set_parity():
    """Same random multi-class predictions through torch greedy NMS and our
    fixpoint kernel must produce identical (box, conf, cls) keep lists."""
    rng = np.random.default_rng(5)
    nc, n = 3, 200
    conf_thres, iou_thres, max_wh = 0.25, 0.45, 7680.0
    for trial in range(5):
        cxy = rng.uniform(60, 400, (n, 2))
        wh = rng.uniform(10, 120, (n, 2))
        scores = rng.uniform(0, 1, (n, nc)) ** 2
        pred = np.concatenate([cxy, wh, scores], 1).astype(np.float32)[None]

        res = non_max_suppression(jnp.asarray(pred), conf_thres=conf_thres,
                                  iou_thres=iou_thres, max_det=300, nc=nc,
                                  method="greedy")
        ours = np.asarray(res.as_pred()[0])[np.asarray(res.valid[0])]

        t = torch.from_numpy(pred[0])
        boxes = torch.cat([t[:, :2] - t[:, 2:4] / 2,
                           t[:, :2] + t[:, 2:4] / 2], 1)
        conf, cls = t[:, 4:4 + nc].max(1)
        m = conf > conf_thres
        boxes_m, conf_m, cls_m = boxes[m], conf[m], cls[m]
        off = boxes_m + (cls_m[:, None].float() * max_wh)
        keep = _torch_greedy_nms(off, conf_m, iou_thres)
        order = sorted(keep, key=lambda i: -float(conf_m[i]))
        want = np.stack([np.concatenate([boxes_m[i].numpy(),
                                         [float(conf_m[i]), float(cls_m[i])]])
                         for i in order])
        assert ours.shape[0] == want.shape[0], trial
        np.testing.assert_allclose(ours[:, :6], want, atol=1e-4,
                                   err_msg=f"trial {trial}")


# --------------------------------------------------------------------------
# optimizer trajectory golden (AdamW + cosine, the decoder-trainer recipe)
# --------------------------------------------------------------------------

def test_golden_adamw_cosine_trajectory():
    steps, lr0, wd = 30, 1e-2, 0.01
    w0 = np.random.default_rng(6).normal(size=(16,)).astype(np.float32)
    target = np.linspace(-1, 1, 16).astype(np.float32)

    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.AdamW([wt], lr=lr0, weight_decay=wd)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps)
    for _ in range(steps):
        opt.zero_grad()
        loss = 0.5 * ((wt - torch.from_numpy(target)) ** 2).sum()
        loss.backward()
        opt.step()
        sched.step()

    schedule = optax.cosine_decay_schedule(lr0, decay_steps=steps)
    tx = optax.adamw(schedule, weight_decay=wd)
    wj = jnp.asarray(w0)
    state = tx.init(wj)
    for _ in range(steps):
        grads = wj - jnp.asarray(target)
        updates, state = tx.update(grads, state, wj)
        wj = optax.apply_updates(wj, updates)

    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------------
# Full SegPP decoder golden: literal reference module tree through the
# converter (YOLOSegPlusPlus.py:12-88 blocks, 156-178 decoder topology)
# --------------------------------------------------------------------------

class TLightConv(tnn.Module):
    """ultralytics LightConv: 1x1 Conv (no act) + DWConv kxk (act)."""

    def __init__(self, c1, c2, k=3):
        super().__init__()
        self.conv1 = TConv(c1, c2, 1, act=False)
        self.conv2 = TConv(c2, c2, k, g=c2, act=True)

    def forward(self, x):
        return self.conv2(self.conv1(x))


class TDoubleLightConv(tnn.Module):
    """Reference DoubleLightConv (YOLOSegPlusPlus.py:33-58)."""

    def __init__(self, c1, c2):
        super().__init__()
        self.conv = tnn.Sequential(TLightConv(c1, c2), TLightConv(c2, c2))
        self.residual_conv = (tnn.Conv2d(c1, c2, 1) if c1 != c2
                              else tnn.Identity())

    def forward(self, x):
        return self.conv(x) + self.residual_conv(x)


class TECA(tnn.Module):
    """Reference ECA (YOLOSegPlusPlus.py:60-88)."""

    def __init__(self, k=3):
        super().__init__()
        self.avg_pool = tnn.AdaptiveAvgPool2d(1)
        self.conv = tnn.Conv1d(1, 1, kernel_size=k, padding=(k - 1) // 2,
                               bias=False)

    def forward(self, x):
        y = self.avg_pool(x)
        y = self.conv(y.squeeze(-1).transpose(-1, -2)).transpose(-1, -2)
        return x * torch.sigmoid(y.unsqueeze(-1)).expand_as(x)


class TSegPPDecoder(tnn.Module):
    """Reference decoder topology + literal state_dict names
    (decoder.{i}.{j}..., output.*; YOLOSegPlusPlus.py:156-178)."""

    def __init__(self):
        super().__init__()
        up = tnn.Upsample(scale_factor=2, mode="bilinear", align_corners=False)
        self.decoder = tnn.ModuleList([
            tnn.Sequential(TC3Ghost(128 + 1, 96, n=1), TECA()),
            tnn.Sequential(up, TDoubleLightConv(96, 64)),
            tnn.Sequential(TC3Ghost(64 + 64, 64, n=1), TECA()),
            tnn.Sequential(up, TDoubleLightConv(64, 32)),
            tnn.Sequential(up, TDoubleLightConv(32, 16)),
        ])
        self.output = tnn.Conv2d(16, 1, kernel_size=1)

    def forward(self, skip2, skip4, logits):
        x = torch.cat([skip4, logits], 1)
        x = self.decoder[0](x)
        x = self.decoder[1](x)
        x = torch.cat([x, skip2], 1)
        x = self.decoder[2](x)
        x = self.decoder[3](x)
        x = self.decoder[4](x)
        return self.output(x)


def test_golden_segpp_decoder_full():
    """The ENTIRE SegPP decoder — C3Ghost/ECA/DoubleLightConv mixing stages,
    bilinear upsamples, output conv — forward-matches the torch reference
    structure through the converter (the ±0.005-Dice north star's numerics)."""
    from yolou_tpu.models.segpp import SegPPDecoder

    t = _randomize(TSegPPDecoder())
    keys = set(_sd(t))
    assert "decoder.0.0.cv1.conv.weight" in keys
    assert "decoder.1.1.conv.0.conv1.conv.weight" in keys
    assert "decoder.2.1.conv.weight" in keys            # ECA conv1d
    assert "decoder.3.1.residual_conv.weight" in keys
    assert "output.bias" in keys

    g = torch.Generator().manual_seed(11)
    skip2 = torch.randn(2, 64, 16, 16, generator=g)
    skip4 = torch.randn(2, 128, 8, 8, generator=g)
    logits = torch.rand(2, 1, 8, 8, generator=g)
    with torch.no_grad():
        want = t(skip2, skip4, logits).numpy()

    jm = SegPPDecoder(use_logits=True)
    nhwc = lambda a: jnp.asarray(a.numpy().transpose(0, 2, 3, 1))
    template = jm.init(jax.random.key(0), nhwc(skip2), nhwc(skip4),
                       nhwc(logits), train=False)
    variables, report = convert_state_dict(_sd(t), jax.device_get(template),
                                           strict=True)
    assert not report["unused"], report["unused"][:8]
    got = np.asarray(jm.apply(variables, nhwc(skip2), nhwc(skip4),
                              nhwc(logits), train=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=5e-5, rtol=1e-4)


# --------------------------------------------------------------------------
# Segment head golden: Detect cv2/cv3 chains + cv4 + Proto (incl. the
# square in==out ConvTranspose whose layout is path-disambiguated)
# --------------------------------------------------------------------------

class TDWConv(TConv):
    def __init__(self, c1, c2, k=1, s=1, act=True):
        import math as _m
        super().__init__(c1, c2, k, s, g=_m.gcd(c1, c2), act=act)


class TProto(tnn.Module):
    def __init__(self, c1, c_=16, c2=8):
        super().__init__()
        self.cv1 = TConv(c1, c_, k=3)
        self.upsample = tnn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = TConv(c_, c_, k=3)
        self.cv3 = TConv(c_, c2)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TSegmentHead(tnn.Module):
    """ultralytics Segment (Detect base) with literal submodule names."""

    def __init__(self, ch, nc=1, nm=8, npr=16, reg_max=4, legacy=False):
        super().__init__()
        self.nc, self.nm, self.reg_max = nc, nm, reg_max
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        c4 = max(ch[0] // 4, nm)
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1)) for x in ch)
        if legacy:
            self.cv3 = tnn.ModuleList(
                tnn.Sequential(TConv(x, c3, 3), TConv(c3, c3, 3),
                               tnn.Conv2d(c3, nc, 1)) for x in ch)
        else:
            self.cv3 = tnn.ModuleList(
                tnn.Sequential(
                    tnn.Sequential(TDWConv(x, x, 3), TConv(x, c3, 1)),
                    tnn.Sequential(TDWConv(c3, c3, 3), TConv(c3, c3, 1)),
                    tnn.Conv2d(c3, nc, 1)) for x in ch)
        self.cv4 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c4, 3), TConv(c4, c4, 3),
                           tnn.Conv2d(c4, nm, 1)) for x in ch)
        self.proto = TProto(ch[0], npr, nm)

    def forward(self, feats):
        p = self.proto(feats[0])
        raw = [torch.cat([self.cv2[i](x), self.cv3[i](x)], 1)
               for i, x in enumerate(feats)]
        mc = torch.cat([self.cv4[i](x).flatten(2) for i, x in enumerate(feats)], 2)
        return raw, mc, p


def test_golden_segment_head_full():
    """Full Segment head (fused eval entry convs) vs literal-named torch:
    raw maps, mask coefficients, and protos all ≤1e-4."""
    from yolou_tpu.nn.heads import Segment

    ch = (16, 32, 64)
    t = _randomize(TSegmentHead(ch))
    keys = set(_sd(t))
    assert "cv3.0.0.0.conv.weight" in keys       # DWConv literal name
    assert "proto.upsample.weight" in keys
    g = torch.Generator().manual_seed(11)
    feats_t = [torch.randn(2, c, hw, hw, generator=g)
               for c, hw in zip(ch, (16, 8, 4))]
    with torch.no_grad():
        raw_t, mc_t, p_t = t(feats_t)

    seg = Segment(nc=1, nm=8, npr=16, reg_max=4)
    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    template = seg.init(jax.random.key(0), feats_j, train=False)
    variables, report = convert_state_dict(_sd(t), jax.device_get(template),
                                           strict=True)
    assert not report["unused"], report["unused"][:8]
    raw_j, mc_j, p_j = seg.apply(variables, feats_j, train=False)
    for rt, rj in zip(raw_t, raw_j):
        np.testing.assert_allclose(np.asarray(rj).transpose(0, 3, 1, 2),
                                   rt.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mc_j).transpose(0, 2, 1),
                               mc_t.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p_j).transpose(0, 3, 1, 2),
                               p_t.numpy(), atol=1e-4, rtol=1e-4)


# --------------------------------------------------------------------------
# FULL yolov12n-seg model golden: spec-driven torch graph with literal
# ultralytics names (model.0 .. model.21) vs the flax graph executor
# --------------------------------------------------------------------------

class TBottleneck(tnn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, k[0], 1)
        self.cv2 = TConv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=(1, 3)):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c1, c_, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = tnn.Sequential(*(TBottleneck(c_, c_, shortcut, g,
                                              k=(k[0], k[1]), e=1.0)
                                  for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat([self.m(self.cv1(x)), self.cv2(x)], 1))


class TC3k(TC3):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__(c1, c2, n, shortcut, g, e, k=(k, k))


class TC3k2(tnn.Module):
    """ultralytics C3k2 (C2f subclass): cv1 -> chunk(2) -> m -> cv2."""

    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(
            TC3k(self.c, self.c, 2, shortcut, g) if c3k
            else TBottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=0.5)
            for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TA2C2fG(tnn.Module):
    """A2C2f with the a2 switch (ABlock pairs vs C3k) and optional gamma."""

    def __init__(self, c1, c2, n=1, a2=True, area=1, residual=False, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv((1 + n) * c_, c2, 1)
        if a2 and residual:
            self.gamma = tnn.Parameter(0.01 * torch.ones(c2))
        self.residual = a2 and residual
        self.m = tnn.ModuleList(
            tnn.Sequential(*(TABlock(c_, max(1, c_ // 32), 2.0, area)
                             for _ in range(2))) if a2
            else TC3k(c_, c_, 2, True, 1)
            for _ in range(n))

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(m(y[-1]) for m in self.m)
        out = self.cv2(torch.cat(y, 1))
        if self.residual:
            return x + self.gamma.view(1, -1, 1, 1) * out
        return out


class TYOLOv12Seg(tnn.Module):
    """Spec-driven torch twin of models/yolo.py's graph executor."""

    def __init__(self, spec, ch_in=4):
        super().__init__()
        self.spec = spec
        mods, ch = [], [ch_in]

        def c_of(j, i):
            return ch[j + 1] if j >= 0 else ch[i]

        for i, l in enumerate(spec.layers):
            cin = c_of(l.frm[0], i)
            if l.block == "Conv":
                m, out = TConv(cin, l.args[0], l.args[1], l.args[2]), l.args[0]
            elif l.block == "C3k2":
                e = l.args[2] if len(l.args) > 2 else 0.5
                m = TC3k2(cin, l.args[0], n=l.repeats, c3k=l.args[1], e=e)
                out = l.args[0]
            elif l.block == "A2C2f":
                area = l.args[2] if len(l.args) > 2 and isinstance(
                    l.args[2], int) and l.args[2] > 0 else 1
                m = TA2C2fG(cin, l.args[0], n=l.repeats, a2=l.args[1],
                            area=area)
                out = l.args[0]
            elif l.block == "Upsample":
                m, out = tnn.Upsample(scale_factor=2, mode="nearest"), cin
            elif l.block == "Concat":
                m, out = tnn.Identity(), sum(c_of(j, i) for j in l.frm)
            elif l.block == "HEAD":
                m = TSegmentHead(tuple(c_of(j, i) for j in l.frm),
                                 nc=spec.nc, nm=spec.nm, npr=spec.npr,
                                 reg_max=spec.reg_max)
                out = 0
            else:  # pragma: no cover
                raise ValueError(l.block)
            mods.append(m)
            ch.append(out)
        self.model = tnn.ModuleList(mods)

    def forward(self, x):
        ys = []
        for i, l in enumerate(self.spec.layers):
            get = lambda j: ys[j] if j != -1 else (ys[-1] if ys else x)
            if l.block == "Concat":
                y = torch.cat([get(j) for j in l.frm], 1)
            elif l.block == "HEAD":
                return self.model[i]([get(j) for j in l.frm])
            else:
                y = self.model[i](get(l.frm[0]))
            ys.append(y)


def test_golden_full_yolov12n_seg_model():
    """Whole-graph forward vs torch: raw maps, mask coefs, protos."""
    from yolou_tpu.models.yolo import build_yolo

    jmod = build_yolo("yolov12", "n", nc=1, ch=4, task="segment")
    t = _randomize(TYOLOv12Seg(jmod.spec, ch_in=4))
    keys = set(_sd(t))
    assert "model.6.m.0.0.attn.qkv.conv.weight" in keys
    assert "model.21.proto.upsample.weight" in keys

    x = torch.randn(2, 4, 64, 64, generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        raw_t, mc_t, p_t = t(x)

    template = jmod.init(jax.random.key(0),
                         jnp.zeros((2, 64, 64, 4)), train=False)
    variables, report = convert_state_dict(_sd(t), jax.device_get(template),
                                           strict=True)
    assert not report["unused"], report["unused"][:8]
    out = jmod.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                     train=False)
    # measured max|d| = 4e-7 f32 across the whole 22-layer graph
    for rt, rj in zip(raw_t, out.raw):
        np.testing.assert_allclose(np.asarray(rj).transpose(0, 3, 1, 2),
                                   rt.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.mask_coefs).transpose(0, 2, 1),
                               mc_t.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.protos).transpose(0, 3, 1, 2),
                               p_t.numpy(), atol=1e-5, rtol=1e-4)


# --------------------------------------------------------------------------
# v8 / v11 family goldens: C2f, SPPF, C2PSA + detect head through the same
# spec-driven torch builder
# --------------------------------------------------------------------------

class TC2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(
            TBottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0)
            for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.m = tnn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class TPSAAttention(tnn.Module):
    """ultralytics PSA Attention (head-major qkv, dw3x3 pe)."""

    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        h = dim + self.key_dim * num_heads * 2
        self.qkv = TConv(dim, h, 1, act=False)
        self.proj = TConv(dim, dim, 1, act=False)
        self.pe = TConv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        q, k, v = self.qkv(x).view(
            B, self.num_heads, self.key_dim * 2 + self.head_dim, N).split(
            [self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * (self.key_dim ** -0.5)
        attn = attn.softmax(dim=-1)
        o = (v @ attn.transpose(-2, -1)).view(B, C, H, W)
        return self.proj(o + self.pe(v.reshape(B, C, H, W)))


class TPSABlock(tnn.Module):
    def __init__(self, c, num_heads, attn_ratio=0.5):
        super().__init__()
        self.attn = TPSAAttention(c, num_heads, attn_ratio)
        self.ffn = tnn.Sequential(TConv(c, c * 2, 1),
                                  TConv(c * 2, c, 1, act=False))

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.ffn(x)


class TC2PSA(tnn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv(2 * self.c, c2, 1)
        self.m = tnn.Sequential(*(TPSABlock(self.c, max(1, self.c // 64))
                                  for _ in range(n)))

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), 1)
        return self.cv2(torch.cat([a, self.m(b)], 1))


class TDetectHead(tnn.Module):
    """ultralytics Detect with literal names: legacy=True is the v8-family
    plain-Conv class branch, legacy=False the v11/v12 DWConv pairs."""

    def __init__(self, ch, nc=1, reg_max=4, legacy=False):
        super().__init__()
        self.nc, self.reg_max = nc, reg_max
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1)) for x in ch)
        if legacy:
            self.cv3 = tnn.ModuleList(
                tnn.Sequential(TConv(x, c3, 3), TConv(c3, c3, 3),
                               tnn.Conv2d(c3, nc, 1)) for x in ch)
        else:
            self.cv3 = tnn.ModuleList(
                tnn.Sequential(
                    tnn.Sequential(TDWConv(x, x, 3), TConv(x, c3, 1)),
                    tnn.Sequential(TDWConv(c3, c3, 3), TConv(c3, c3, 1)),
                    tnn.Conv2d(c3, nc, 1)) for x in ch)

    def forward(self, feats):
        return [torch.cat([self.cv2[i](x), self.cv3[i](x)], 1)
                for i, x in enumerate(feats)], None, None


class TYOLOGraph(TYOLOv12Seg):
    """Extends the spec-driven builder to the v8/v11 block set."""

    def __init__(self, spec, ch_in=3):
        tnn.Module.__init__(self)
        self.spec = spec
        mods, ch = [], [ch_in]

        def c_of(j, i):
            return ch[j + 1] if j >= 0 else ch[i]

        for i, l in enumerate(spec.layers):
            cin = c_of(l.frm[0], i)
            out = l.args[0] if l.args else cin
            if l.block == "Conv":
                m = TConv(cin, l.args[0], l.args[1], l.args[2])
            elif l.block == "C3k2":
                e = l.args[2] if len(l.args) > 2 else 0.5
                m = TC3k2(cin, l.args[0], n=l.repeats, c3k=l.args[1], e=e)
            elif l.block == "C2f":
                sc = l.args[1] if len(l.args) > 1 else False
                m = TC2f(cin, l.args[0], n=l.repeats, shortcut=sc)
            elif l.block == "SPPF":
                m = TSPPF(cin, l.args[0], l.args[1])
            elif l.block == "C2PSA":
                m = TC2PSA(cin, l.args[0], n=l.repeats)
            elif l.block == "A2C2f":
                area = l.args[2] if len(l.args) > 2 and isinstance(
                    l.args[2], int) and l.args[2] > 0 else 1
                m = TA2C2fG(cin, l.args[0], n=l.repeats, a2=l.args[1],
                            area=area)
            elif l.block == "Upsample":
                m, out = tnn.Upsample(scale_factor=2, mode="nearest"), cin
            elif l.block == "Concat":
                m, out = tnn.Identity(), sum(c_of(j, i) for j in l.frm)
            elif l.block == "HEAD":
                hch = tuple(c_of(j, i) for j in l.frm)
                if spec.task == "segment":
                    m = TSegmentHead(hch, nc=spec.nc, nm=spec.nm,
                                     npr=spec.npr, reg_max=spec.reg_max,
                                     legacy=spec.legacy_head)
                else:
                    m = TDetectHead(hch, nc=spec.nc, reg_max=spec.reg_max,
                                    legacy=spec.legacy_head)
                out = 0
            else:  # pragma: no cover
                raise ValueError(l.block)
            mods.append(m)
            ch.append(out)
        self.model = tnn.ModuleList(mods)


@pytest.mark.parametrize("arch", ["yolov8", "yolo11"])
def test_golden_full_family_detect_model(arch):
    from yolou_tpu.models.yolo import build_yolo

    jmod = build_yolo(arch, "n", nc=1, ch=3, task="detect")
    t = _randomize(TYOLOGraph(jmod.spec, ch_in=3))
    x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(6))
    with torch.no_grad():
        raw_t, _, _ = t(x)
    template = jmod.init(jax.random.key(0),
                         jnp.zeros((1, 64, 64, 3)), train=False)
    variables, report = convert_state_dict(_sd(t), jax.device_get(template),
                                           strict=True)
    assert not report["unused"], report["unused"][:8]
    out = jmod.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                     train=False)
    for rt, rj in zip(raw_t, out.raw):
        np.testing.assert_allclose(np.asarray(rj).transpose(0, 3, 1, 2),
                                   rt.numpy(), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("arch", ["yolov8", "yolo11"])
def test_golden_full_family_segment_model(arch):
    """Whole-graph v8/v11 SEGMENT goldens: exercises the legacy (v8) vs
    modern (v11) class-branch structure through the converter AND the fused
    eval head — raw maps, mask coefs, protos."""
    from yolou_tpu.models.yolo import build_yolo

    jmod = build_yolo(arch, "n", nc=1, ch=3, task="segment")
    t = _randomize(TYOLOGraph(jmod.spec, ch_in=3))
    keys = set(_sd(t))
    head = len(jmod.spec.layers) - 1
    if arch == "yolov8":   # legacy plain-Conv class branch
        assert f"model.{head}.cv3.0.0.conv.weight" in keys
        assert f"model.{head}.cv3.0.0.0.conv.weight" not in keys
    else:                  # modern DWConv pairs
        assert f"model.{head}.cv3.0.0.0.conv.weight" in keys
    x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        raw_t, mc_t, p_t = t(x)
    template = jmod.init(jax.random.key(0),
                         jnp.zeros((1, 64, 64, 3)), train=False)
    variables, report = convert_state_dict(_sd(t), jax.device_get(template),
                                           strict=True)
    assert not report["unused"], report["unused"][:8]
    out = jmod.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                     train=False)
    for rt, rj in zip(raw_t, out.raw):
        np.testing.assert_allclose(np.asarray(rj).transpose(0, 3, 1, 2),
                                   rt.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.mask_coefs).transpose(0, 2, 1),
                               mc_t.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.protos).transpose(0, 3, 1, 2),
                               p_t.numpy(), atol=1e-5, rtol=1e-4)


# --------------------------------------------------------------------------
# TaskAlignedAssigner + v8 segmentation loss torch twin (VERDICT r3 #4).
# Transcribed to ultralytics semantics: utils/tal.py TaskAlignedAssigner,
# utils/loss.py v8DetectionLoss/BboxLoss/DFLoss, and the reference's modified
# mask term (custom_v8_segmentation_loss.py:41-246 — crop-BCE/area + 0.8x
# per-image global Tversky added per anchor).
# --------------------------------------------------------------------------

def _t_xywh2xyxy(x):
    y = x.clone()
    y[..., 0] = x[..., 0] - x[..., 2] / 2
    y[..., 1] = x[..., 1] - x[..., 3] / 2
    y[..., 2] = x[..., 0] + x[..., 2] / 2
    y[..., 3] = x[..., 1] + x[..., 3] / 2
    return y


def _t_xyxy2xywh(x):
    y = x.clone()
    y[..., 0] = (x[..., 0] + x[..., 2]) / 2
    y[..., 1] = (x[..., 1] + x[..., 3]) / 2
    y[..., 2] = x[..., 2] - x[..., 0]
    y[..., 3] = x[..., 3] - x[..., 1]
    return y


def _t_make_anchors(feats, strides, offset=0.5):
    anchor_points, stride_tensor = [], []
    for f, s in zip(feats, strides):
        h, w = f.shape[2], f.shape[3]
        sx = torch.arange(w, dtype=torch.float32) + offset
        sy = torch.arange(h, dtype=torch.float32) + offset
        gy, gx = torch.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(torch.stack((gx, gy), -1).view(-1, 2))
        stride_tensor.append(torch.full((h * w, 1), float(s)))
    return torch.cat(anchor_points), torch.cat(stride_tensor)


def _t_dist2bbox(distance, anchor_points, xywh=True, dim=-1):
    lt, rb = distance.chunk(2, dim)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return torch.cat(((x1y1 + x2y2) / 2, x2y2 - x1y1), dim)
    return torch.cat((x1y1, x2y2), dim)


def _t_bbox2dist(anchor_points, bbox, reg_max):
    x1y1, x2y2 = bbox.chunk(2, -1)
    return torch.cat((anchor_points - x1y1, x2y2 - anchor_points),
                     -1).clamp_(0, reg_max - 0.01)


def _t_bbox_iou_ciou(box1, box2, eps=1e-7):
    """ultralytics utils/metrics.py bbox_iou(xywh=False, CIoU=True)."""
    b1_x1, b1_y1, b1_x2, b1_y2 = box1.chunk(4, -1)
    b2_x1, b2_y1, b2_x2, b2_y2 = box2.chunk(4, -1)
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    inter = (b1_x2.minimum(b2_x2) - b1_x1.maximum(b2_x1)).clamp_(0) * (
        b1_y2.minimum(b2_y2) - b1_y1.maximum(b2_y1)).clamp_(0)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = b1_x2.maximum(b2_x2) - b1_x1.minimum(b2_x1)
    ch = b1_y2.maximum(b2_y2) - b1_y1.minimum(b2_y1)
    c2 = cw.pow(2) + ch.pow(2) + eps
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2).pow(2)
            + (b2_y1 + b2_y2 - b1_y1 - b1_y2).pow(2)) / 4
    v = (4 / math.pi ** 2) * ((w2 / h2).atan() - (w1 / h1).atan()).pow(2)
    with torch.no_grad():
        alpha = v / (v - iou + (1 + eps))
    return iou - (rho2 / c2 + v * alpha)


def _t_crop_mask(masks, boxes):
    _, h, w = masks.shape
    x1, y1, x2, y2 = torch.chunk(boxes[:, :, None], 4, 1)
    r = torch.arange(w, dtype=x1.dtype)[None, None, :]
    c = torch.arange(h, dtype=x1.dtype)[None, :, None]
    return masks * ((r >= x1) * (r < x2) * (c >= y1) * (c < y2))


class TTaskAlignedAssigner:
    """ultralytics utils/tal.py TaskAlignedAssigner (topk=10, alpha=.5,
    beta=6) — the assigner Customv8SegmentationLoss inherits (line 78-85)."""

    def __init__(self, topk=10, num_classes=80, alpha=0.5, beta=6.0, eps=1e-9):
        self.topk, self.num_classes = topk, num_classes
        self.alpha, self.beta, self.eps = alpha, beta, eps

    @torch.no_grad()
    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels,
                 gt_bboxes, mask_gt):
        self.bs = pd_scores.shape[0]
        self.n_max_boxes = gt_bboxes.shape[1]
        mask_pos, align_metric, overlaps = self.get_pos_mask(
            pd_scores, pd_bboxes, gt_labels, gt_bboxes, anc_points, mask_gt)
        target_gt_idx, fg_mask, mask_pos = self.select_highest_overlaps(
            mask_pos, overlaps, self.n_max_boxes)
        target_labels, target_bboxes, target_scores = self.get_targets(
            gt_labels, gt_bboxes, target_gt_idx, fg_mask)
        align_metric *= mask_pos
        pos_align_metrics = align_metric.amax(dim=-1, keepdim=True)
        pos_overlaps = (overlaps * mask_pos).amax(dim=-1, keepdim=True)
        norm_align_metric = (align_metric * pos_overlaps
                             / (pos_align_metrics + self.eps)
                             ).amax(-2).unsqueeze(-1)
        target_scores = target_scores * norm_align_metric
        return (target_labels, target_bboxes, target_scores, fg_mask.bool(),
                target_gt_idx)

    def get_pos_mask(self, pd_scores, pd_bboxes, gt_labels, gt_bboxes,
                     anc_points, mask_gt):
        mask_in_gts = self.select_candidates_in_gts(anc_points, gt_bboxes)
        align_metric, overlaps = self.get_box_metrics(
            pd_scores, pd_bboxes, gt_labels, gt_bboxes,
            (mask_in_gts * mask_gt).bool())
        mask_topk = self.select_topk_candidates(
            align_metric, topk_mask=mask_gt.expand(-1, -1, self.topk).bool())
        mask_pos = mask_topk * mask_in_gts * mask_gt
        return mask_pos, align_metric, overlaps

    def select_candidates_in_gts(self, xy_centers, gt_bboxes, eps=1e-9):
        n_anchors = xy_centers.shape[0]
        bs, n_boxes, _ = gt_bboxes.shape
        lt, rb = gt_bboxes.view(-1, 1, 4).chunk(2, 2)
        bbox_deltas = torch.cat(
            (xy_centers[None] - lt, rb - xy_centers[None]),
            dim=2).view(bs, n_boxes, n_anchors, -1)
        return bbox_deltas.amin(3).gt_(eps)

    def get_box_metrics(self, pd_scores, pd_bboxes, gt_labels, gt_bboxes,
                        mask_gt):
        na = pd_bboxes.shape[-2]
        overlaps = torch.zeros([self.bs, self.n_max_boxes, na])
        bbox_scores = torch.zeros([self.bs, self.n_max_boxes, na])
        ind = torch.zeros([2, self.bs, self.n_max_boxes], dtype=torch.long)
        ind[0] = torch.arange(self.bs).view(-1, 1).expand(-1, self.n_max_boxes)
        ind[1] = gt_labels.squeeze(-1)
        bbox_scores[mask_gt] = pd_scores[ind[0], :, ind[1]][mask_gt]
        pd_boxes = pd_bboxes.unsqueeze(1).expand(
            -1, self.n_max_boxes, -1, -1)[mask_gt]
        gt_boxes = gt_bboxes.unsqueeze(2).expand(-1, -1, na, -1)[mask_gt]
        overlaps[mask_gt] = _t_bbox_iou_ciou(
            gt_boxes, pd_boxes).squeeze(-1).clamp_(0)
        align_metric = bbox_scores.pow(self.alpha) * overlaps.pow(self.beta)
        return align_metric, overlaps

    def select_topk_candidates(self, metrics, largest=True, topk_mask=None):
        topk_metrics, topk_idxs = torch.topk(metrics, self.topk, dim=-1,
                                             largest=largest)
        if topk_mask is None:
            topk_mask = (topk_metrics.max(-1, keepdim=True)[0]
                         > self.eps).expand_as(topk_idxs)
        topk_idxs.masked_fill_(~topk_mask, 0)
        count_tensor = torch.zeros(metrics.shape, dtype=torch.int8)
        ones = torch.ones_like(topk_idxs[:, :, :1], dtype=torch.int8)
        for k in range(self.topk):
            count_tensor.scatter_add_(-1, topk_idxs[:, :, k:k + 1], ones)
        count_tensor.masked_fill_(count_tensor > 1, 0)
        return count_tensor.to(metrics.dtype)

    @staticmethod
    def select_highest_overlaps(mask_pos, overlaps, n_max_boxes):
        fg_mask = mask_pos.sum(-2)
        if fg_mask.max() > 1:
            mask_multi_gts = (fg_mask.unsqueeze(1) > 1).expand(
                -1, n_max_boxes, -1)
            max_overlaps_idx = overlaps.argmax(1)
            is_max_overlaps = torch.zeros(mask_pos.shape,
                                          dtype=mask_pos.dtype)
            is_max_overlaps.scatter_(1, max_overlaps_idx.unsqueeze(1), 1)
            mask_pos = torch.where(mask_multi_gts, is_max_overlaps,
                                   mask_pos).float()
            fg_mask = mask_pos.sum(-2)
        target_gt_idx = mask_pos.argmax(-2)
        return target_gt_idx, fg_mask, mask_pos

    def get_targets(self, gt_labels, gt_bboxes, target_gt_idx, fg_mask):
        batch_ind = torch.arange(self.bs, dtype=torch.int64)[..., None]
        target_gt_idx_f = target_gt_idx + batch_ind * self.n_max_boxes
        target_labels = gt_labels.long().flatten()[target_gt_idx_f]
        target_bboxes = gt_bboxes.view(-1, gt_bboxes.shape[-1])[target_gt_idx_f]
        target_labels.clamp_(0)
        target_scores = torch.zeros(
            (target_labels.shape[0], target_labels.shape[1],
             self.num_classes), dtype=torch.int64)
        target_scores.scatter_(2, target_labels.unsqueeze(-1), 1)
        fg_scores_mask = fg_mask[:, :, None].repeat(1, 1, self.num_classes)
        target_scores = torch.where(fg_scores_mask > 0, target_scores, 0)
        return target_labels, target_bboxes, target_scores


class TV8SegLoss:
    """Customv8SegmentationLoss twin: v8DetectionLoss internals + the
    reference's calculate_segmentation_loss/single_mask_loss (crop-BCE/area +
    0.8x per-image global Tversky, custom_v8_segmentation_loss.py:124-153)."""

    def __init__(self, nc, strides, reg_max=16, topk=10,
                 box=7.5, cls=0.5, dfl=1.5):
        self.nc, self.reg_max = nc, reg_max
        self.no = nc + reg_max * 4
        self.stride = torch.tensor([float(s) for s in strides])
        self.hyp_box, self.hyp_cls, self.hyp_dfl = box, cls, dfl
        self.bce = torch.nn.BCEWithLogitsLoss(reduction="none")
        self.assigner = TTaskAlignedAssigner(topk=topk, num_classes=nc,
                                             alpha=0.5, beta=6.0)
        self.proj = torch.arange(reg_max, dtype=torch.float32)
        self.overlap = True

    def preprocess(self, targets, batch_size, scale_tensor):
        nl, ne = targets.shape
        if nl == 0:
            return torch.zeros(batch_size, 0, ne - 1)
        i = targets[:, 0]
        _, counts = i.unique(return_counts=True)
        counts = counts.to(dtype=torch.int32)
        out = torch.zeros(batch_size, counts.max(), ne - 1)
        for j in range(batch_size):
            matches = i == j
            if n := matches.sum():
                out[j, :n] = targets[matches, 1:]
        out[..., 1:5] = _t_xywh2xyxy(out[..., 1:5].mul_(scale_tensor))
        return out

    def bbox_decode(self, anchor_points, pred_dist):
        b, a, c = pred_dist.shape
        pred_dist = pred_dist.view(b, a, 4, c // 4).softmax(3).matmul(
            self.proj)
        return _t_dist2bbox(pred_dist, anchor_points, xywh=False)

    @staticmethod
    def _df_loss(pred_dist, target):
        tl = target.long()
        tr = tl + 1
        wl = tr - target
        wr = 1 - wl
        ce = torch.nn.functional.cross_entropy
        return (ce(pred_dist, tl.view(-1), reduction="none").view(tl.shape)
                * wl
                + ce(pred_dist, tr.view(-1), reduction="none").view(tl.shape)
                * wr).mean(-1, keepdim=True)

    def bbox_loss(self, pred_dist, pred_bboxes, anchor_points, target_bboxes,
                  target_scores, target_scores_sum, fg_mask):
        weight = target_scores.sum(-1)[fg_mask].unsqueeze(-1)
        iou = _t_bbox_iou_ciou(pred_bboxes[fg_mask], target_bboxes[fg_mask])
        loss_iou = ((1.0 - iou) * weight).sum() / target_scores_sum
        target_ltrb = _t_bbox2dist(anchor_points, target_bboxes,
                                   self.reg_max - 1)
        loss_dfl = self._df_loss(
            pred_dist[fg_mask].view(-1, self.reg_max),
            target_ltrb[fg_mask]) * weight
        loss_dfl = loss_dfl.sum() / target_scores_sum
        return loss_iou, loss_dfl

    @staticmethod
    def tversky(inputs, targets, smooth=1, alpha=0.4, beta=0.6):
        inputs = torch.sigmoid(inputs).reshape(-1)
        targets = targets.reshape(-1)
        tp = (inputs * targets).sum()
        fp = ((1 - targets) * inputs).sum()
        fn = (targets * (1 - inputs)).sum()
        return 1 - (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)

    def single_mask_loss(self, gt_mask, pred, proto, xyxy, area):
        pred_mask = torch.einsum("in,nhw->ihw", pred, proto)
        bce_loss = torch.nn.functional.binary_cross_entropy_with_logits(
            pred_mask, gt_mask, reduction="none")
        bce_loss_cropped = (_t_crop_mask(bce_loss, xyxy).mean(dim=(1, 2))
                            / (area + 1e-8))
        tversky_loss = self.tversky(pred_mask, gt_mask)
        return ((1 * bce_loss_cropped) + (0.8 * tversky_loss)).sum()

    def calculate_segmentation_loss(self, fg_mask, masks, target_gt_idx,
                                    target_bboxes, batch_idx, proto,
                                    pred_masks, imgsz, overlap):
        _, _, mask_h, mask_w = proto.shape
        loss = 0
        target_bboxes_normalized = target_bboxes / imgsz[[1, 0, 1, 0]]
        marea = _t_xyxy2xywh(target_bboxes_normalized)[..., 2:].prod(2)
        mxyxy = target_bboxes_normalized * torch.tensor(
            [mask_w, mask_h, mask_w, mask_h])
        for i, single_i in enumerate(zip(fg_mask, target_gt_idx, pred_masks,
                                         proto, mxyxy, marea, masks)):
            (fg_mask_i, target_gt_idx_i, pred_masks_i, proto_i, mxyxy_i,
             marea_i, masks_i) = single_i
            if fg_mask_i.any():
                mask_idx = target_gt_idx_i[fg_mask_i]
                if overlap:
                    gt_mask = (masks_i == (mask_idx + 1).view(-1, 1, 1)
                               ).float()
                else:
                    gt_mask = masks[batch_idx.view(-1) == i][mask_idx]
                loss += self.single_mask_loss(
                    gt_mask, pred_masks_i[fg_mask_i], proto_i,
                    mxyxy_i[fg_mask_i], marea_i[fg_mask_i])
            else:
                loss += (proto * 0).sum() + (pred_masks * 0).sum()
        return loss / fg_mask.sum()

    def __call__(self, feats, pred_masks, proto, batch):
        loss = torch.zeros(4)  # box, seg, cls, dfl
        batch_size, _, mask_h, mask_w = proto.shape
        pred_distri, pred_scores = torch.cat(
            [xi.view(feats[0].shape[0], self.no, -1) for xi in feats],
            2).split((self.reg_max * 4, self.nc), 1)
        pred_scores = pred_scores.permute(0, 2, 1).contiguous()
        pred_distri = pred_distri.permute(0, 2, 1).contiguous()
        pred_masks = pred_masks.permute(0, 2, 1).contiguous()
        imgsz = torch.tensor(feats[0].shape[2:],
                             dtype=torch.float32) * self.stride[0]
        anchor_points, stride_tensor = _t_make_anchors(feats, self.stride,
                                                       0.5)
        batch_idx = batch["batch_idx"].view(-1, 1)
        targets = torch.cat(
            (batch_idx, batch["cls"].view(-1, 1), batch["bboxes"]), 1)
        targets = self.preprocess(targets, batch_size,
                                  scale_tensor=imgsz[[1, 0, 1, 0]])
        gt_labels, gt_bboxes = targets.split((1, 4), 2)
        mask_gt = gt_bboxes.sum(2, keepdim=True).gt_(0.0)
        pred_bboxes = self.bbox_decode(anchor_points, pred_distri)
        _, target_bboxes, target_scores, fg_mask, target_gt_idx = \
            self.assigner(
                pred_scores.detach().sigmoid(),
                (pred_bboxes.detach() * stride_tensor).type(gt_bboxes.dtype),
                anchor_points * stride_tensor, gt_labels, gt_bboxes, mask_gt)
        target_scores_sum = max(target_scores.sum(), 1)
        loss[2] = self.bce(pred_scores,
                           target_scores.float()).sum() / target_scores_sum
        if fg_mask.sum():
            loss[0], loss[3] = self.bbox_loss(
                pred_distri, pred_bboxes, anchor_points,
                target_bboxes / stride_tensor, target_scores,
                target_scores_sum, fg_mask)
            masks = batch["masks"].float()
            loss[1] = self.calculate_segmentation_loss(
                fg_mask, masks, target_gt_idx, target_bboxes, batch_idx,
                proto, pred_masks, imgsz, self.overlap)
        loss[0] *= self.hyp_box
        loss[1] *= self.hyp_box
        loss[2] *= self.hyp_cls
        loss[3] *= self.hyp_dfl
        return (loss * batch_size,
                (target_scores, fg_mask, target_gt_idx, anchor_points))


def _v8_golden_inputs():
    """Fixed synthetic batch: 3 images (3 GT / 1 GT / EMPTY), nc=3, imgsz=64,
    feats 8x8+4x4+2x2 (A=84), reg_max=16, nm=8 protos at 16x16."""
    rng = np.random.default_rng(42)
    b, nc, reg_max, nm = 3, 3, 16, 8
    strides = (8, 16, 32)
    shapes = [(8, 8), (4, 4), (2, 2)]
    no = nc + 4 * reg_max
    feats = [rng.normal(0, 1.0, (b, h, w, no)).astype(np.float32)
             for h, w in shapes]
    coefs = rng.normal(0, 0.5, (b, 84, nm)).astype(np.float32)
    protos = rng.normal(0, 0.5, (b, 16, 16, nm)).astype(np.float32)
    # disjoint GT boxes (normalized xywh)
    gts = {0: [(0, (0.25, 0.25, 0.35, 0.30)),
               (1, (0.70, 0.30, 0.25, 0.40)),
               (2, (0.40, 0.75, 0.45, 0.30))],
           1: [(2, (0.50, 0.50, 0.60, 0.55))],
           2: []}
    G = 5
    cls = np.zeros((b, G), np.int32)
    boxes = np.zeros((b, G, 4), np.float32)
    valid = np.zeros((b, G), bool)
    masks = np.zeros((b, G, 16, 16), np.float32)
    overlap_map = np.zeros((b, 16, 16), np.float32)
    for i, items in gts.items():
        for j, (c, xywh) in enumerate(items):
            cls[i, j] = c
            boxes[i, j] = xywh
            valid[i, j] = True
            cx, cy, w, h = xywh
            x1, x2 = int(round((cx - w / 2) * 16)), int(round((cx + w / 2) * 16))
            y1, y2 = int(round((cy - h / 2) * 16)), int(round((cy + h / 2) * 16))
            masks[i, j, y1:y2, x1:x2] = 1.0
            overlap_map[i, y1:y2, x1:x2] = j + 1
    return (feats, coefs, protos, cls, boxes, valid, masks, overlap_map,
            strides, nc, reg_max)


def test_golden_v8_seg_loss_and_tal():
    """All four loss parts and the TAL assignment (fg set, target_gt_idx,
    target_scores) must match the torch transcription to <=1e-4 on a batch
    with multi-GT, single-GT and EMPTY images."""
    from yolou_tpu.losses.v8 import LossHyp, v8_loss
    from yolou_tpu.losses.tal import task_aligned_assign
    from yolou_tpu.ops.boxes import (dfl_decode, dist2bbox, make_anchors,
                                     xywh2xyxy)

    (feats, coefs, protos, cls, boxes, valid, masks, overlap_map,
     strides, nc, reg_max) = _v8_golden_inputs()
    b = feats[0].shape[0]

    # ---- torch side
    tfeats = [torch.from_numpy(f.transpose(0, 3, 1, 2)).clone() for f in feats]
    t_pred_masks = torch.from_numpy(coefs.transpose(0, 2, 1)).clone()
    t_proto = torch.from_numpy(protos.transpose(0, 3, 1, 2)).clone()
    bidx, bcls, bbox = [], [], []
    for i in range(b):
        for j in range(valid.shape[1]):
            if valid[i, j]:
                bidx.append(i)
                bcls.append(cls[i, j])
                bbox.append(boxes[i, j])
    tbatch = {"batch_idx": torch.tensor(bidx, dtype=torch.float32),
              "cls": torch.tensor(bcls, dtype=torch.float32),
              "bboxes": torch.tensor(np.asarray(bbox)),
              "masks": torch.from_numpy(overlap_map)}
    crit = TV8SegLoss(nc=nc, strides=strides, reg_max=reg_max)
    tloss, (t_tscores, t_fg, t_gt_idx, t_anchors) = crit(
        tfeats, t_pred_masks, t_proto, tbatch)

    # ---- jax side
    targets = {"cls": jnp.asarray(cls), "bboxes": jnp.asarray(boxes),
               "valid": jnp.asarray(valid), "masks": jnp.asarray(masks)}
    out = v8_loss(tuple(jnp.asarray(f) for f in feats), jnp.asarray(coefs),
                  jnp.asarray(protos), targets, nc=nc, strides=strides,
                  reg_max=reg_max, hyp=LossHyp())

    # per-part parity (reference returns gained parts; ours are pre-gain)
    got = {k: float(v) for k, v in out.parts.items()}
    want = tloss.detach().numpy() / b  # loss*batch_size -> per-part gained
    np.testing.assert_allclose(got["box"] * 7.5, want[0], rtol=1e-4)
    np.testing.assert_allclose(got["seg"] * 7.5, want[1], rtol=1e-4)
    np.testing.assert_allclose(got["cls"] * 0.5, want[2], rtol=1e-4)
    np.testing.assert_allclose(got["dfl"] * 1.5, want[3], rtol=1e-4)
    np.testing.assert_allclose(
        float(out.total),
        float(tloss.sum()), rtol=1e-4)

    # ---- TAL internals: identical fg set, gt indices and target scores
    feat_shapes = tuple((f.shape[1], f.shape[2]) for f in feats)
    anchors, stride_t = make_anchors(feat_shapes, strides, 0.5)
    flat = jnp.concatenate(
        [jnp.asarray(f).reshape(b, -1, f.shape[-1]) for f in feats], 1)
    pred_distri = flat[..., : 4 * reg_max]
    pred_scores = flat[..., 4 * reg_max:]
    pb = dist2bbox(dfl_decode(pred_distri, reg_max), anchors[None],
                   xywh=False)
    gt_xyxy = xywh2xyxy(jnp.asarray(boxes)) * 64.0
    assign = task_aligned_assign(
        jax.nn.sigmoid(pred_scores), pb * stride_t[None],
        anchors * stride_t, jnp.asarray(cls), gt_xyxy, jnp.asarray(valid),
        topk=10)
    np.testing.assert_array_equal(np.asarray(assign.fg_mask),
                                  t_fg.numpy())
    fg = t_fg.numpy()
    np.testing.assert_array_equal(np.asarray(assign.target_gt_idx)[fg],
                                  t_gt_idx.numpy()[fg])
    np.testing.assert_allclose(np.asarray(assign.target_scores),
                               t_tscores.numpy(), atol=1e-5)
    # sanity: the batch actually exercises fg anchors on images 0 and 1
    assert fg[0].sum() > 0 and fg[1].sum() > 0 and fg[2].sum() == 0


def _t_match_predictions(pred_cls, true_classes, iou, iouv):
    """ultralytics BaseValidator.match_predictions transcription (torch in,
    the same numpy dedup steps it actually runs)."""
    correct = np.zeros((pred_cls.shape[0], iouv.shape[0])).astype(bool)
    correct_class = true_classes[:, None] == pred_cls
    iou = iou * correct_class
    iou = iou.cpu().numpy()
    for i, threshold in enumerate(iouv.cpu().tolist()):
        matches = np.nonzero(iou >= threshold)
        matches = np.array(matches).T
        if matches.shape[0]:
            if matches.shape[0] > 1:
                matches = matches[
                    iou[matches[:, 0], matches[:, 1]].argsort()[::-1]]
                matches = matches[
                    np.unique(matches[:, 1], return_index=True)[1]]
                matches = matches[
                    np.unique(matches[:, 0], return_index=True)[1]]
            correct[matches[:, 1].astype(int), i] = True
    return torch.tensor(correct, dtype=torch.bool)


def test_golden_match_predictions():
    """metrics/det.py::match_predictions vs the ultralytics validator
    matcher on random boxes + a case where greedy-by-confidence and
    IoU-sorted-unique matching genuinely disagree (VERDICT r3 #8)."""
    from yolou_tpu.metrics.det import IOUV, box_iou_np, match_predictions

    rng = np.random.default_rng(5)
    for trial in range(20):
        n_gt, n_pred = rng.integers(0, 8), rng.integers(0, 12)
        gt_xy = rng.random((n_gt, 2)) * 80
        gt = np.concatenate([gt_xy, gt_xy + 5 + rng.random((n_gt, 2)) * 30],
                            1).astype(np.float32)
        pert = rng.normal(0, 4, (n_pred, 4)).astype(np.float32)
        base = gt[rng.integers(0, max(n_gt, 1), n_pred)] if n_gt else \
            rng.random((n_pred, 4)).astype(np.float32) * 80
        pred = base + pert
        pred[:, 2:] = np.maximum(pred[:, 2:], pred[:, :2] + 1)
        gcls = rng.integers(0, 2, n_gt)
        pcls = rng.integers(0, 2, n_pred)
        got = match_predictions(pred, pcls, gt, gcls)
        iou_t = torch.from_numpy(box_iou_np(gt, pred))
        want = _t_match_predictions(torch.from_numpy(pcls),
                                    torch.from_numpy(gcls), iou_t,
                                    torch.from_numpy(IOUV))
        np.testing.assert_array_equal(got, want.numpy(), err_msg=f"trial {trial}")

    # discriminating case (old greedy-by-confidence would differ): pred1's
    # BEST gt is gt0 (0.952) so the pred-unique step pairs it with gt0 only;
    # the gt-unique step then hands gt0 to pred0 (lower pred index) and pred1
    # ends UNMATCHED below t=0.85 even though IoU(pred1, gt1)=0.833 >= t —
    # a per-pred greedy "best available GT" matcher would match both.
    gt = np.array([[0, 0.0, 10, 10.0],        # gt0
                   [0, 0.5, 10, 12.0]],       # gt1 (overlaps gt0)
                  np.float32)
    pred = np.array([[0, 0.0, 10, 8.2],       # p0: .82 g0 / .644 g1
                     [0, 0.0, 10, 10.5]],     # p1: .952 g0 / .833 g1
                    np.float32)
    tp = match_predictions(pred, np.zeros(2, int), gt, np.zeros(2, int))
    want = np.zeros((2, 10), bool)
    want[0, :7] = True                         # p0 gets gt0 up to t=0.80
    want[1, 7:] = True                         # p1 only once p0 drops out
    np.testing.assert_array_equal(tp, want)


def _t_compute_ap(recall: torch.Tensor, precision: torch.Tensor) -> float:
    """Torch transcription of ultralytics.utils.metrics.compute_ap
    (101-point COCO interp, recall[-1]+0.01 sentinel)."""
    mrec = torch.cat([torch.zeros(1, dtype=torch.float64), recall,
                      recall[-1:] + 0.01])
    mpre = torch.cat([torch.ones(1, dtype=torch.float64), precision,
                      torch.zeros(1, dtype=torch.float64)])
    mpre = torch.flip(torch.cummax(torch.flip(mpre, [0]), 0).values, [0])
    x = torch.linspace(0, 1, 101, dtype=torch.float64)
    # np.interp equivalent on a monotonically increasing mrec; right=True
    # matches np.interp's tie handling (value of the LAST tied sample)
    idx = torch.searchsorted(mrec, x, right=True).clamp(1, len(mrec) - 1)
    x0, x1 = mrec[idx - 1], mrec[idx]
    y0, y1 = mpre[idx - 1], mpre[idx]
    w = torch.where(x1 > x0, (x - x0) / (x1 - x0), torch.zeros_like(x))
    y = y0 + w * (y1 - y0)
    y = torch.where(x >= mrec[-1], mpre[-1], y)
    return float(torch.trapezoid(y, x))


def _t_ap_per_threshold(tp: torch.Tensor, conf: torch.Tensor,
                        n_gt: int) -> torch.Tensor:
    """Torch transcription of the AP loop in ultralytics ap_per_class."""
    order = torch.argsort(-conf)
    tp = tp[order].to(torch.float64)
    aps = []
    for ti in range(tp.shape[1]):
        tpc = torch.cumsum(tp[:, ti], 0)
        fpc = torch.cumsum(1.0 - tp[:, ti], 0)
        recall = tpc / (n_gt + 1e-16)
        precision = tpc / (tpc + fpc)
        aps.append(_t_compute_ap(recall, precision))
    return torch.tensor(aps, dtype=torch.float64)


def test_golden_compute_ap():
    """metrics/det.py AP integral end-to-end vs the ultralytics
    compute_ap/ap_per_class transcription (VERDICT r4 #5): random TP
    matrices from the *golden-pinned matcher*, through cumsum PR curves,
    envelope, and 101-point integration. Fitness (0.1*mAP50 + 0.9*mAP)
    selects best.ckpt through these numbers."""
    from yolou_tpu.metrics.det import (DetMetrics, IOUV, average_precision,
                                       box_iou_np, match_predictions)

    rng = np.random.default_rng(11)
    for trial in range(12):
        n_gt, n_pred = int(rng.integers(1, 10)), int(rng.integers(1, 16))
        gt_xy = rng.random((n_gt, 2)) * 80
        gt = np.concatenate([gt_xy, gt_xy + 5 + rng.random((n_gt, 2)) * 30],
                            1).astype(np.float32)
        base = gt[rng.integers(0, n_gt, n_pred)]
        pred = base + rng.normal(0, 4, (n_pred, 4)).astype(np.float32)
        pred[:, 2:] = np.maximum(pred[:, 2:], pred[:, :2] + 1)
        conf = rng.random(n_pred).astype(np.float32)
        cls0 = np.zeros(n_pred, int)
        tp = match_predictions(pred, cls0, gt, np.zeros(n_gt, int))
        got = average_precision(tp, conf, n_gt)
        want = _t_ap_per_threshold(torch.from_numpy(tp),
                                   torch.from_numpy(conf), n_gt)
        np.testing.assert_allclose(got, want.numpy(), rtol=0, atol=1e-12,
                                   err_msg=f"trial {trial}")

        # and through the DetMetrics accumulator (the trainer's surface).
        # update() conf-sorts BEFORE matching (ultralytics preds arrive
        # NMS-sorted) and the matcher's gt-dedup tiebreak depends on pred
        # numbering, so the golden must match on the sorted preds too.
        m = DetMetrics(nc=1)
        m.update(pred, conf, cls0, gt, np.zeros(n_gt, int))
        res = m.compute()
        order = np.argsort(-conf)
        tp_sorted = match_predictions(pred[order], cls0, gt,
                                      np.zeros(n_gt, int))
        want_m = _t_ap_per_threshold(torch.from_numpy(tp_sorted),
                                     torch.from_numpy(conf[order]), n_gt)
        assert abs(res["map50"] - float(want_m[0])) < 1e-12
        assert abs(res["map"] - float(want_m.mean())) < 1e-12

    # hand case: known integral. One pred, one gt, perfect match at all t.
    gt = np.array([[0, 0, 10, 10]], np.float32)
    tp = match_predictions(gt.copy(), np.zeros(1, int), gt, np.zeros(1, int))
    ap = average_precision(tp, np.array([0.9], np.float32), 1)
    # recall curve reaches 1.0 with precision 1.0 => 101-interp AP = 1.0
    np.testing.assert_allclose(ap, np.ones(10), atol=1e-12)
