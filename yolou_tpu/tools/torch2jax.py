"""Torch (reference-style) state_dict -> flax variables converter.

The reference's checkpoints are (a) ultralytics DetectionModel weights
(`model.{i}.<...>` names; `yolo_checkpoint/weights/best.pt`, gitignored in the
snapshot) and (b) plain YOLOSegPlusPlus state_dicts (`encoder.{i}.<...>`,
`decoder.{i}.<...>`, `output.*`; saved at train.py:428). This module maps our
flax param tree to those torch names rule-by-rule and transplants tensors with
the right layout transposes:

  conv.weight  (O,I,kh,kw)  -> conv/kernel (kh,kw,I,O)
  deconv.weight (I,O,kh,kw) -> kernel (kh,kw,I... flax ConvTranspose (kh,kw,I,O))
  bn.weight/bias            -> bn/scale, bn/bias
  bn.running_mean/var       -> batch_stats bn/mean, bn/var
  Conv1d weight (1,1,k)     -> conv1d/kernel (k,1,1)

Because the real .pt is absent from the snapshot, correctness is enforced by a
bijection test (every flax leaf maps to a unique torch name and back) plus a
synthetic round-trip in tests/test_torch2jax.py.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------- name mapping

def _module_segment(seg: str) -> Optional[str]:
    """Translate one flax module-name segment to its torch dotted form.
    Returns None for wrapper segments that have no torch counterpart."""
    if seg in ("dw", "c3", "detect", "decoder"):
        # structural wrappers on our side: YOLOSegPP's "decoder" submodule
        # wraps stages whose table entries below already carry the torch
        # "decoder.{i}" / "output" prefixes (YOLOSegPlusPlus.py:156-183).
        return None
    if seg.startswith("model_"):
        return f"model.{seg[6:]}"
    m = re.fullmatch(r"(cv[234])_(\d+)_(\d+)(?:_(\d+))?", seg)
    if m:
        parts = [m.group(1), m.group(2), m.group(3)]
        if m.group(4) is not None:
            parts.append(m.group(4))
        return ".".join(parts)
    m = re.fullmatch(r"m(\d+)_(\d+)", seg)
    if m:
        return f"m.{m.group(1)}.{m.group(2)}"
    m = re.fullmatch(r"m(\d+)", seg)
    if m:
        return f"m.{m.group(1)}"
    table = {
        "mlp1": "mlp.0", "mlp2": "mlp.1",
        "ffn1": "ffn.0", "ffn2": "ffn.1",   # PSABlock ffn Sequential
        # ultralytics GhostBottleneck.conv is always a 3-slot Sequential:
        # conv.0 = GhostConv, conv.1 = DWConv (s=2) or nn.Identity (s=1),
        # conv.2 = GhostConv — so ghost2 lives at conv.2 in BOTH cases.
        "ghost1": "conv.0", "ghost2": "conv.2", "dwmid": "conv.1",
        "sc_dw": "shortcut.0", "sc_pw": "shortcut.1",
        "conv_a": "conv.0", "conv_b": "conv.1",
        "conv1d": "conv",               # ECA's Conv1d (YOLOSegPlusPlus.py:70)
        "residual": "residual_conv",
        # SegPP decoder (torch ModuleList of Sequentials,
        # YOLOSegPlusPlus.py:156-178; upsample is the parameterless [0])
        "mix0": "decoder.0.0", "eca0": "decoder.0.1",
        "up1": "decoder.1.1", "mix2": "decoder.2.0", "eca2": "decoder.2.1",
        "up3": "decoder.3.1", "up4": "decoder.4.1", "output": "output",
    }
    return table.get(seg, seg)


def flax_to_torch_name(path: Tuple[str, ...], collection: str) -> Optional[str]:
    """Map a flax variable path (module segments + leaf) to the torch name."""
    *mods, leaf = path
    segs: List[str] = []
    for seg in mods:
        t = _module_segment(seg)
        if t is not None:
            segs.append(t)
    if collection == "batch_stats":
        leaf_t = {"mean": "running_mean", "var": "running_var"}[leaf]
    elif leaf == "kernel":
        leaf_t = "weight"
    elif leaf == "scale":
        leaf_t = "weight"
    else:
        leaf_t = leaf
    return ".".join(segs + [leaf_t])


def _to_flax_layout(torch_arr: np.ndarray, flax_shape: Tuple[int, ...],
                    path: Tuple[str, ...]) -> Optional[np.ndarray]:
    a = np.asarray(torch_arr)
    if tuple(a.shape) == tuple(flax_shape):
        return a
    if a.ndim == 4:
        # ConvTranspose2d (I, O, kh, kw) -> (kh, kw, I, O), SPATIALLY
        # FLIPPED: torch ConvTranspose2d is the true conv transpose while
        # flax nn.ConvTranspose (lax.conv_transpose, transpose_kernel=False)
        # is a fractionally-strided correlation — same op iff the kernel is
        # flipped. Must be decided by PATH, not by shape fit: a square
        # in==out deconv (Proto's upsample, c_->c_ 2x2) fits the Conv2d
        # transpose too — with the axes silently swapped.
        if "upsample" in path:
            t = a.transpose(2, 3, 0, 1)[::-1, ::-1]
            if t.shape == tuple(flax_shape):
                return np.ascontiguousarray(t)
        # Conv2d OIHW -> HWIO
        t = a.transpose(2, 3, 1, 0)
        if t.shape == tuple(flax_shape):
            return t
        t = a.transpose(2, 3, 0, 1)
        if t.shape == tuple(flax_shape):
            return t
    # Conv1d (1, 1, k) -> (k, 1, 1)
    if a.ndim == 3:
        t = a.transpose(2, 1, 0)
        if t.shape == tuple(flax_shape):
            return t
    if a.size == int(np.prod(flax_shape)):
        return a.reshape(flax_shape)
    return None


# --------------------------------------------------------------- conversion

def aattn_qkv_permutation(c3: int, hd: int = 32) -> np.ndarray:
    """Output-channel permutation for AAttn's qkv conv: ultralytics stores
    qkv HEAD-major interleaved (channel = h*3*hd + role*hd + d, from
    view(B,N,heads,3*hd).split in AAttn.forward), while the runtime layout
    here is ROLE-major (channel = role*C + h*hd + d) so q/k/v are contiguous
    lane-aligned thirds. perm[ours] = theirs; apply to the qkv conv kernel's
    O axis and the qkv BN scale/bias/mean/var."""
    c = c3 // 3
    heads = c // hd
    perm = np.empty(c3, np.int64)
    for role in range(3):
        for h in range(heads):
            base = role * c + h * hd
            perm[base:base + hd] = h * 3 * hd + role * hd + np.arange(hd)
    return perm


def _is_aattn_qkv(path: Tuple[str, ...]) -> bool:
    """AAttn qkv leaves: .../attn/qkv/{conv,bn}/... with out == 3*in (PSA
    attention also names its projection 'qkv' but its width is dim*1.25 and
    its layout already matches ultralytics — excluded by the width check in
    the caller)."""
    return "qkv" in path and "attn" in path

def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        p = prefix + (k,)
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]):
    root: Dict = {}
    for path, v in flat.items():
        node = root
        for seg in path[:-1]:
            node = node.setdefault(seg, {})
        node[path[-1]] = v
    return root


def convert_state_dict(torch_sd: Dict[str, np.ndarray], template: Dict,
                       prefix_map: Optional[Dict[str, str]] = None,
                       strict: bool = True) -> Tuple[Dict, Dict]:
    """Fill a flax `variables` template from a torch state_dict.

    prefix_map rewrites our top-level subtrees to torch prefixes; e.g. for the
    SegPP decoder checkpoint: {"yolo.model": "encoder"} maps
    params/yolo/model_{i} -> encoder.{i}. Returns (variables, report) where
    report lists matched/missing/unused torch keys.
    """
    prefix_map = prefix_map or {}
    out = {}
    matched, missing = [], []
    used = set()

    # AAttn qkv modules need an output-channel permutation (head-major
    # interleaved in torch -> role-major thirds here). Identify them by their
    # conv kernel shape (O == 3*I), then permute every leaf under the module.
    qkv_modules = {}
    if "params" in template:
        for path, leaf in _flatten(template["params"]).items():
            if (path[-4:-2] == ("attn", "qkv") and path[-2:] == ("conv", "kernel")
                    and np.ndim(leaf) == 4
                    and np.shape(leaf)[-1] == 3 * np.shape(leaf)[-2]):
                qkv_modules[path[:-2]] = aattn_qkv_permutation(np.shape(leaf)[-1])

    def maybe_permute(path, arr):
        perm = qkv_modules.get(path[:-2]) if len(path) >= 2 else None
        if perm is None:
            return arr
        if arr.ndim == 4:            # HWIO kernel: permute O
            return arr[..., perm]
        if arr.ndim == 1 and arr.shape[0] == perm.shape[0]:  # BN params/stats
            return arr[perm]
        return arr

    for coll in ("params", "batch_stats"):
        if coll not in template:
            continue
        flat = _flatten(template[coll])
        conv = {}
        for path, leaf in flat.items():
            tname = flax_to_torch_name(path, coll)
            # apply prefix rewrites on the dotted name
            for ours, theirs in prefix_map.items():
                if tname.startswith(ours):
                    tname = theirs + tname[len(ours):]
                    break
            if tname in torch_sd:
                arr = _to_flax_layout(torch_sd[tname], np.shape(leaf), path)
                if arr is None:
                    raise ValueError(
                        f"shape mismatch for {tname}: torch "
                        f"{np.shape(torch_sd[tname])} vs flax {np.shape(leaf)}")
                arr = maybe_permute(path, arr)
                conv[path] = arr.astype(np.asarray(leaf).dtype)
                matched.append(tname)
                used.add(tname)
            else:
                conv[path] = np.asarray(leaf)
                missing.append(".".join(path) + f" (wanted {tname})")
        out[coll] = _unflatten(conv)
    unused = [k for k in torch_sd
              if k not in used and not k.endswith("num_batches_tracked")
              and "anchors" not in k and "dfl" not in k and k != "param"]
    report = {"matched": len(matched), "missing": missing, "unused": unused}
    if strict and missing:
        raise KeyError(f"{len(missing)} template leaves unmatched; first: "
                       f"{missing[:5]}")
    return out, report


# ------------------------------------------------------- reverse conversion

def _to_torch_layout(flax_arr: np.ndarray, path: Tuple[str, ...]) -> np.ndarray:
    """Inverse of _to_flax_layout for every leaf class this framework emits."""
    a = np.asarray(flax_arr)
    if a.ndim == 4:
        if "upsample" in path:
            # flax ConvTranspose (kh,kw,I,O), spatially flipped -> torch
            # ConvTranspose2d (I,O,kh,kw) (see _to_flax_layout on why)
            return np.ascontiguousarray(a[::-1, ::-1].transpose(2, 3, 0, 1))
        return np.ascontiguousarray(a.transpose(3, 2, 0, 1))   # HWIO -> OIHW
    if a.ndim == 3:
        return np.ascontiguousarray(a.transpose(2, 1, 0))      # (k,1,1)->(1,1,k)
    return a


def jax_to_torch_state_dict(variables: Dict,
                            prefix_map: Optional[Dict[str, str]] = None,
                            include_aux: bool = True) -> Dict[str, np.ndarray]:
    """Flax variables -> reference-style torch state_dict (numpy values).

    Exact inverse of convert_state_dict — same name bijection
    (flax_to_torch_name), inverse layout transposes (_to_torch_layout), and
    the inverse AAttn qkv channel permutation (role-major thirds back to
    ultralytics' head-major interleave) — so weights fine-tuned here load
    back into the reference's torch ecosystem (train.py:563-564 loads plain
    state_dicts). With include_aux it also synthesizes the released
    checkpoints' non-learned keys: per-BN ``num_batches_tracked`` (0) and the
    Detect head's fixed DFL projection (``arange(reg_max)``), making the
    export key-for-key identical to the released listings pinned in
    tests/fixtures/*_state_dict.txt.
    """
    prefix_map = prefix_map or {}
    out: Dict[str, np.ndarray] = {}

    inv_qkv = {}
    if "params" in variables:
        for path, leaf in _flatten(variables["params"]).items():
            if (path[-4:-2] == ("attn", "qkv") and path[-2:] == ("conv", "kernel")
                    and np.ndim(leaf) == 4
                    and np.shape(leaf)[-1] == 3 * np.shape(leaf)[-2]):
                # ours = theirs[perm]  =>  theirs = ours[argsort(perm)]
                inv_qkv[path[:-2]] = np.argsort(
                    aattn_qkv_permutation(np.shape(leaf)[-1]))

    for coll in ("params", "batch_stats"):
        if coll not in variables:
            continue
        for path, leaf in _flatten(variables[coll]).items():
            arr = np.asarray(leaf)
            if np.issubdtype(arr.dtype, np.floating):
                arr = arr.astype(np.float32)
            inv = inv_qkv.get(path[:-2]) if len(path) >= 2 else None
            if inv is not None:
                if arr.ndim == 4:                      # HWIO kernel: O axis
                    arr = arr[..., inv]
                elif arr.ndim == 1 and arr.shape[0] == inv.shape[0]:
                    arr = arr[inv]                     # qkv BN params/stats
            tname = flax_to_torch_name(path, coll)
            for ours, theirs in prefix_map.items():
                if tname.startswith(ours):
                    tname = theirs + tname[len(ours):]
                    break
            if tname in out:
                raise ValueError(f"duplicate torch name {tname} from {path}")
            out[tname] = _to_torch_layout(arr, path)

    if include_aux:
        for name in list(out):
            if name.endswith(".running_mean"):
                out[name[:-len("running_mean")] + "num_batches_tracked"] = (
                    np.zeros((), np.int64))
        # Detect/Segment head: ultralytics registers DFL's fixed projection
        # as a parameter; synthesize it next to the head's cv2 box branch.
        for name, arr in list(out.items()):
            m = re.fullmatch(r"(.*)\.cv2\.0\.2\.weight", name)
            if m and arr.ndim == 4 and arr.shape[0] % 4 == 0:
                reg_max = arr.shape[0] // 4
                out[f"{m.group(1)}.dfl.conv.weight"] = (
                    np.arange(reg_max, dtype=np.float32)
                    .reshape(1, reg_max, 1, 1))
    return out


def save_torch_state_dict(path: str, sd: Dict[str, np.ndarray]) -> None:
    """Write a numpy state_dict as a plain torch .pt (tensor values only)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a plain torch state_dict .pt/.pth (weights_only — no pickle exec)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


SEGPP_PREFIX_MAP = {
    # our params/yolo/model_{i} holds the whole YOLO graph; the reference
    # decoder checkpoint stores only the encoder slice as encoder.{i}
    "model": "encoder",
}
