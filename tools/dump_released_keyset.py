"""Regenerate the released-checkpoint key-set fixtures.

Writes tests/fixtures/{yolov12n_seg,yolov8n_seg}_state_dict.txt: one
``<torch key> <shape>`` line per state_dict entry of the corresponding
*released* ultralytics model (nc=80, ch=3, reg_max=16, nm=32, npr=64 at n
scale), including BN ``num_batches_tracked`` counters and Detect's fixed
``dfl.conv.weight``.

Provenance: this sandbox has zero network egress and no ultralytics install,
so the listing is generated from the literal-named torch twins in
tests/test_torch_golden.py (ultralytics 8.3.x module naming: Conv.conv/bn,
C2f/C3k2 cv1/cv2/m.{i}, A2C2f m.{i}.{j}.attn.{qkv,proj,pe}, Segment
cv2/cv3/cv4/proto, v8-legacy vs v12 cv3 branch structure) and cross-checked
against the reference repo's printed per-layer parameter table
(/root/reference/YOLOSegPlusPlus.py:124-136) and the published model sizes.
The fixture is checked in so OUR graph naming / converter template is pinned:
any rename or structural drift on our side fails tests/test_released_keyset.py
even though both live sides would still agree with each other.

Usage: PYTHONPATH=/root/repo python tools/dump_released_keyset.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolou_tpu.models.yolo import build_yolo  # noqa: E402
from tests.test_torch_golden import TYOLOGraph, TYOLOv12Seg  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def dump(arch, fname):
    jmod = build_yolo(arch, "n", nc=80, ch=3, task="segment")
    spec = jmod.spec
    twin_cls = TYOLOv12Seg if arch == "yolov12" else TYOLOGraph
    t = twin_cls(spec, ch_in=3)
    sd = t.state_dict()
    head_idx = len(spec.layers) - 1
    lines = {k: tuple(v.shape) for k, v in sd.items()}
    # Detect's DFL projection conv — a real (non-trainable) parameter in the
    # released state_dict; our DFL decode is arithmetic, so the converter
    # ignores it by design.
    lines[f"model.{head_idx}.dfl.conv.weight"] = (1, spec.reg_max, 1, 1)
    os.makedirs(FIXDIR, exist_ok=True)
    path = os.path.join(FIXDIR, fname)
    with open(path, "w") as f:
        f.write("# released %s-seg (n scale, nc=80, ch=3) state_dict keys+"
                "shapes\n# regenerate: python tools/dump_released_keyset.py"
                "\n" % arch)
        for k in sorted(lines):
            f.write(f"{k} {','.join(map(str, lines[k]))}\n")
    n_params = sum(
        int(__import__('numpy').prod(s)) for k, s in lines.items()
        if not k.endswith("num_batches_tracked"))
    print(f"{path}: {len(lines)} keys, {n_params/1e6:.3f}M params "
          f"(incl. running stats + dfl)")


if __name__ == "__main__":
    dump("yolov12", "yolov12n_seg_state_dict.txt")
    dump("yolov8", "yolov8n_seg_state_dict.txt")
    dump("yolo11", "yolo11n_seg_state_dict.txt")
