"""Predictor: source routing -> fused on-device preprocess/forward/NMS -> Results.

Covers the reference's predictor stack (custom_yolo_predictor/*): the source
router (custom_load_inference_source.py — files, dirs, globs, txt lists,
numpy arrays, PIL), 4-channel UNCHANGED decode (custom_load_images_and_videos
.py:99), BasePredictor's letterbox+normalize preprocess, and the detection/
segmentation postprocess (custom_detseg_predictor.py:87-135, 288-313:
NMS -> process_mask(upsample=True) -> scale_boxes -> Results, dropping
empty-mask detections).

TPU design: preprocess + forward + NMS (+ mask proto decode) compile into ONE
XLA program; the host only decodes images and trims padded outputs.
"""

from __future__ import annotations

import glob as globlib
import os
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..models.yolo import YOLOModel
from ..ops.letterbox import letterbox_batch
from ..ops.masks import process_mask, process_mask_native
from ..ops.nms import non_max_suppression
from ..ops import boxes as box_ops
from .results import Boxes, Masks, Results

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp",
            ".heic", ".heif")
VID_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm", ".gif")
STREAM_SCHEMES = ("rtsp://", "rtmp://", "http://", "https://", "tcp://")

Source = Union[str, np.ndarray, Sequence[Union[str, np.ndarray]]]


def _read_video_frames(path: str, stride: int = 1) -> List[Tuple[str, np.ndarray]]:
    """Video ingestion (CustomLoadImagesAndVideos capability,
    custom_load_images_and_videos.py:124-155): every `stride`-th frame."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    i = 0
    while cap.isOpened():
        ok, frame = cap.read()
        if not ok:
            break
        if i % stride == 0:
            frames.append((f"{path}#frame{i}", frame))
        i += 1
    cap.release()
    return frames


def _read_stream_frames(url: str, max_frames: int = 32,
                        stride: int = 1) -> List[Tuple[str, np.ndarray]]:
    """Network-stream ingestion (rtsp/rtmp/http; ultralytics LoadStreams
    capability): reads up to max_frames frames then releases — the batched
    predictor consumes finite clips, not an endless live loop."""
    import cv2

    cap = cv2.VideoCapture(url)
    if not cap.isOpened():
        raise IOError(f"cannot open stream {url}")
    frames = []
    i = 0
    while len(frames) < max_frames:
        ok, frame = cap.read()
        if not ok:
            break
        if i % stride == 0:
            frames.append((f"{url}#frame{i}", frame))
        i += 1
    cap.release()
    return frames


def _read_webcam_frames(index: int, max_frames: int = 1) -> List[Tuple[str, np.ndarray]]:
    """Webcam-index source (`source=0` / `"0"`, ultralytics LoadStreams camera
    dispatch — custom_load_inference_source.py:34-49 routes integer strings to
    the stream loader). Gated like screenshots: a headless sandbox raises an
    informative error instead of hanging on a missing device."""
    import cv2

    cap = cv2.VideoCapture(index)
    if not cap.isOpened():
        cap.release()
        raise RuntimeError(
            f"webcam source {index!r} could not be opened (no camera device "
            f"— headless environment?); use a file/dir/URL source instead")
    frames = []
    for i in range(max_frames):
        ok, frame = cap.read()
        if not ok:
            break
        if frame.ndim == 2:
            frame = frame[..., None]
        frames.append((f"webcam{index}#frame{i}", frame))
    cap.release()
    if not frames:
        raise RuntimeError(f"webcam source {index!r} produced no frames")
    return frames


def _grab_screenshot(spec: str) -> np.ndarray:
    """Screenshot source ("screen" / "screen<N>", ultralytics LoadScreenshots
    capability). Uses mss when available, else PIL.ImageGrab; both are gated
    — headless sandboxes raise an informative error instead of crashing."""
    idx = int(spec[6:]) if len(spec) > 6 and spec[6:].isdigit() else 0
    try:
        import mss  # optional dependency

        with mss.mss() as sct:
            mon = sct.monitors[idx + 1 if len(sct.monitors) > 1 else 0]
            shot = np.asarray(sct.grab(mon))[..., :3]       # BGRA -> BGR
            return np.ascontiguousarray(shot)
    except ImportError:
        pass
    try:
        from PIL import ImageGrab

        arr = np.asarray(ImageGrab.grab())
        return arr[..., ::-1].copy()                         # RGB -> BGR
    except Exception as e:  # pragma: no cover - needs a display
        raise RuntimeError(
            f"screenshot source {spec!r} needs `mss` or a display for "
            f"PIL.ImageGrab: {e}") from e


def _read_heic(path: str, channels: int) -> np.ndarray:
    """HEIC/HEIF decode via PIL (+pillow-heif plugin when present) —
    custom_load_images_and_videos.py:159-167 registers the same plugin."""
    try:
        import pillow_heif  # optional dependency

        pillow_heif.register_heif_opener()
    except ImportError:
        pass
    from PIL import Image

    try:
        img = Image.open(path)
        img.load()
    except Exception as e:
        raise IOError(
            f"cannot decode {path}: HEIC support needs the pillow-heif "
            f"plugin ({e})") from e
    mode = "RGBA" if channels >= 4 else ("L" if channels == 1 else "RGB")
    arr = np.asarray(img.convert(mode))
    if arr.ndim == 2:
        return arr[..., None]
    if arr.shape[-1] >= 3:  # RGB(A) -> BGR(A), matching cv2 decode order
        arr = np.concatenate([arr[..., :3][..., ::-1], arr[..., 3:]], axis=-1)
    return arr


def load_source(source: Source, channels: int = 4) -> List[Tuple[str, np.ndarray]]:
    """Route any source to a list of (path, HWC uint8 image) pairs."""
    try:
        import cv2
    except ImportError:  # pragma: no cover
        cv2 = None

    def read(path: str) -> np.ndarray:
        if path.lower().endswith((".heic", ".heif")):
            return _read_heic(path, channels)
        flag = cv2.IMREAD_UNCHANGED if channels != 1 else cv2.IMREAD_GRAYSCALE
        img = cv2.imread(path, flag)
        if img is None:
            raise IOError(f"cannot read {path}")
        if img.ndim == 2:
            img = img[..., None]
        return img

    def from_pil(img) -> np.ndarray:
        """PIL ingestion with the reference's RGBA mode for multi-channel
        (custom_load_pil_and_numpy.py:44) and RGB->BGR reversal (line 56)."""
        mode = "RGBA" if channels >= 4 else ("L" if channels == 1 else "RGB")
        arr = np.asarray(img.convert(mode))
        if arr.ndim == 2:
            return arr[..., None]
        if arr.shape[-1] >= 3:  # RGB(A) -> BGR(A)
            arr = np.concatenate([arr[..., :3][..., ::-1], arr[..., 3:]], axis=-1)
        return arr

    items: List[Tuple[str, np.ndarray]] = []
    try:
        from PIL import Image as _PILImage
    except ImportError:  # pragma: no cover
        _PILImage = None
    if _PILImage is not None and isinstance(source, _PILImage.Image):
        items.append(("pil_0", from_pil(source)))
        source = []
    if isinstance(source, bool):
        raise TypeError(f"unsupported source type: {source!r}")
    if isinstance(source, int):  # camera index (ultralytics source=0)
        items.extend(_read_webcam_frames(source))
    elif isinstance(source, np.ndarray):
        arrs = source if source.ndim == 4 else source[None]
        for i, a in enumerate(arrs):
            items.append((f"array_{i}", np.asarray(a)))
    elif isinstance(source, str):
        if source.isdigit():  # "0" -> camera index, like ultralytics
            items.extend(_read_webcam_frames(int(source)))
        elif source.lower().startswith(STREAM_SCHEMES):
            items.extend(_read_stream_frames(source))
        elif source.lower().startswith("screen"):
            items.append((source, _grab_screenshot(source)))
        elif os.path.isdir(source):
            for f in sorted(os.listdir(source)):
                if f.lower().endswith(IMG_EXTS):
                    items.append((os.path.join(source, f),
                                  read(os.path.join(source, f))))
        elif any(c in source for c in "*?["):
            for f in sorted(globlib.glob(source)):
                items.append((f, read(f)))
        elif source.endswith(".txt"):
            with open(source) as fh:
                for line in fh:
                    p = line.strip()
                    if p:
                        items.append((p, read(p)))
        elif source.lower().endswith(VID_EXTS):
            items.extend(_read_video_frames(source))
        else:
            items.append((source, read(source)))
    else:  # sequence
        for i, s in enumerate(source):
            if isinstance(s, np.ndarray):
                items.append((f"array_{i}", s))
            elif _PILImage is not None and isinstance(s, _PILImage.Image):
                items.append((f"pil_{i}", from_pil(s)))
            else:
                items.append((s, read(s)))
    # channel harmonization
    fixed = []
    for path, img in items:
        if img.shape[-1] < channels:
            extra = np.repeat(img.mean(-1, keepdims=True).astype(img.dtype),
                              channels - img.shape[-1], -1)
            img = np.concatenate([img, extra], -1)
        elif img.shape[-1] > channels:
            img = img[..., :channels]
        fixed.append((path, img))
    return fixed


class Predictor:
    """Unified detect/segment predictor over a YOLOModel."""

    def __init__(self, model: YOLOModel, variables: Dict, imgsz: int = 640,
                 channels: int = 4, conf: float = 0.25, iou: float = 0.45,
                 max_det: int = 300, batch_size: int = 16,
                 names: Optional[Dict[int, str]] = None,
                 keep_orig_images: bool = True, retina_masks: bool = False):
        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self.channels = channels
        self.batch_size = batch_size
        self.task = model.spec.task
        self.names = names or {i: str(i) for i in range(model.spec.nc)}
        self.keep_orig_images = keep_orig_images
        self.retina_masks = retina_masks
        # stem_s2d models take loader-layout space-to-depth(4) uint8 input;
        # the predictor then letterboxes on HOST (native loader / cv2 — the
        # reference's own preprocessing locus) instead of on device.
        self.stem_s2d = bool(getattr(model, "stem_s2d", False))
        nm = model.spec.nm if self.task == "segment" else 0

        @jax.jit
        def infer(variables, imgs_u8):
            if self.stem_s2d:
                x = (imgs_u8.astype(jnp.float32) / 255.0).astype(model.dtype)
            else:
                x = letterbox_batch(imgs_u8, (imgsz, imgsz))
            out = model.apply(variables, x, train=False)
            dets = non_max_suppression(out.preds, conf_thres=conf,
                                       iou_thres=iou, max_det=max_det,
                                       nc=model.spec.nc)
            masks = None
            if self.task == "segment" and not retina_masks:
                masks = jax.vmap(
                    lambda proto, coefs, bx: process_mask(
                        proto, coefs, bx, (imgsz, imgsz), upsample=True)
                )(out.protos, dets.extra, dets.boxes)
            return dets, masks, out

        self._infer = infer

        @partial(jax.jit, static_argnames=("orig_hw",))
        def infer_retina(variables, imgs_u8, orig_hw):
            """Retina-mask path: full-resolution masks in original-image
            coordinates (ops.process_mask_native; construct_result's
            retina_masks branch)."""
            dets, _, out = infer(variables, imgs_u8)
            scaled = jax.vmap(lambda b: box_ops.scale_boxes(
                (imgsz, imgsz), b, orig_hw))(dets.boxes)
            masks = jax.vmap(
                lambda proto, coefs, bx: process_mask_native(
                    proto, coefs, bx, orig_hw, (imgsz, imgsz))
            )(out.protos, dets.extra, scaled)
            dets = dets._replace(boxes=scaled)
            return dets, masks, out

        self._infer_retina = infer_retina

        @jax.jit
        def raw(variables, imgs):
            if self.stem_s2d:
                x = (imgs.astype(jnp.float32) / 255.0).astype(model.dtype)
            else:
                x = letterbox_batch(imgs, (imgsz, imgsz))
            return model.apply(variables, x, train=False)

        self._raw = raw

    def _preprocess_host(self, imgs_u8: np.ndarray) -> np.ndarray:
        """stem_s2d host path: letterbox (u8, reference semantics) + s2d(4)."""
        from ..native.loader import host_letterbox_s2d

        return host_letterbox_s2d(imgs_u8, self.imgsz)

    def raw_forward(self, imgs_u8: np.ndarray):
        """Letterbox + model forward only (objectmap/visualization path)."""
        if self.stem_s2d:
            imgs_u8 = self._preprocess_host(np.asarray(imgs_u8))
        return self._raw(self.variables, jnp.asarray(imgs_u8))

    def __call__(self, source: Source) -> List[Results]:
        items = load_source(source, self.channels)
        # Bucket by original HxW: a directory of heterogeneous images (the
        # ordinary ultralytics predict case) batches per shape — each bucket
        # hits its own cached jit specialization — and results return in
        # source order.
        buckets: Dict[Tuple[int, int], List[int]] = {}
        for idx, (_, img) in enumerate(items):
            buckets.setdefault(tuple(img.shape[:2]), []).append(idx)
        results: List[Optional[Results]] = [None] * len(items)

        def drain(pending):
            sel, n_real, dets, masks, pre_scaled = pending
            dets_np = jax.device_get(dets)
            masks_np = np.asarray(masks) if masks is not None else None
            for i in range(n_real):
                path, orig = items[sel[i]]
                results[sel[i]] = self._build_result(
                    path, orig, dets_np.boxes[i], dets_np.conf[i],
                    dets_np.cls[i], dets_np.valid[i],
                    masks_np[i] if masks_np is not None else None,
                    pre_scaled=pre_scaled)

        # Software pipeline: jax dispatch is async, so by deferring the
        # device_get of chunk i until chunk i+1 has been preprocessed and
        # dispatched, host preprocessing/result building overlaps device
        # compute — one chunk in flight.
        pending = None
        for idxs in buckets.values():
            for start in range(0, len(idxs), self.batch_size):
                sel = idxs[start:start + self.batch_size]
                chunk = [items[j] for j in sel]
                n_real = len(chunk)
                while len(chunk) < self.batch_size:  # pad with first element
                    chunk.append(chunk[0])
                imgs = np.stack([c[1] for c in chunk])
                orig_hw = tuple(imgs.shape[1:3])
                if self.stem_s2d:
                    imgs = self._preprocess_host(imgs)
                pre_scaled = self.retina_masks and self.task == "segment"
                if pre_scaled:
                    dets, masks, _ = self._infer_retina(
                        self.variables, jnp.asarray(imgs), orig_hw)
                else:
                    dets, masks, _ = self._infer(self.variables,
                                                 jnp.asarray(imgs))
                if pending is not None:
                    drain(pending)
                pending = (sel, n_real, dets, masks, pre_scaled)
        if pending is not None:
            drain(pending)
        return results

    def _build_result(self, path, orig, boxes, conf, cls, valid, masks,
                      pre_scaled: bool = False) -> Results:
        n = int(valid.sum())
        boxes = np.asarray(boxes[:n], np.float32)
        conf = np.asarray(conf[:n], np.float32)
        cls = np.asarray(cls[:n], np.float32)
        mask_out = None
        if masks is not None:
            m = np.asarray(masks[:n], np.float32)
            keep = m.sum((-2, -1)) > 0      # drop empty masks (predictor parity)
            boxes, conf, cls, m = boxes[keep], conf[keep], cls[keep], m[keep]
            if m.size and not pre_scaled:
                mh, mw = m.shape[-2:]
                oh, ow = orig.shape[:2]
                if (mh, mw) != (oh, ow):
                    gain = min(mh / oh, mw / ow)
                    ph = int(round((mh - oh * gain) / 2))
                    pw = int(round((mw - ow * gain) / 2))
                    m = m[:, ph:mh - ph or None, pw:mw - pw or None]
                    try:
                        import cv2
                        m = np.stack([cv2.resize(mi, (ow, oh),
                                                 interpolation=cv2.INTER_LINEAR)
                                      for mi in m]) > 0.5
                        m = m.astype(np.float32)
                    except ImportError:  # pragma: no cover
                        pass
            mask_out = Masks(m)
        if pre_scaled:
            scaled = boxes
        else:
            scaled = np.asarray(box_ops.scale_boxes(
                (self.imgsz, self.imgsz), jnp.asarray(boxes), orig.shape[:2]))
        data = np.concatenate([scaled, conf[:, None], cls[:, None]], axis=1)
        return Results(orig_img=orig if self.keep_orig_images else None,
                       path=path, names=self.names, boxes=Boxes(data),
                       masks=mask_out)
