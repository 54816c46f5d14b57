"""Checkpoint converter tests: name bijection + synthetic torch round-trip."""

import numpy as np
import torch

from yolou_tpu.tools.torch2jax import (convert_state_dict, flax_to_torch_name,
                                       load_torch_state_dict)

from .common import cached_init


def _flat(tree, prefix=()):
    for k, v in tree.items():
        p = prefix + (k,)
        if isinstance(v, dict):
            yield from _flat(v, p)
        else:
            yield p, v


def _torch_layout(flax_arr, path):
    a = np.asarray(flax_arr)
    if a.ndim == 4:
        if "upsample" in path:           # flax convT (kh,kw,I,O) -> torch
            return a[::-1, ::-1].transpose(2, 3, 0, 1)  # (I,O,kh,kw), flipped
        return a.transpose(3, 2, 0, 1)   # HWIO -> OIHW
    if a.ndim == 3:
        return a.transpose(2, 1, 0)      # (k,1,1) -> (1,1,k)
    return a


def test_name_mapping_is_injective():
    _, variables = cached_init("yolov12", "n", task="segment", ch=4, nc=1)
    names = {}
    for coll in ("params", "batch_stats"):
        for path, _ in _flat(variables[coll]):
            t = flax_to_torch_name(path, coll)
            key = (coll if coll == "batch_stats" else "p", t)
            assert key not in names, f"collision: {t} <- {path} and {names[key]}"
            names[key] = path
    # spot-check expected reference-style names
    all_names = {t for (_, t) in names}
    assert "model.0.conv.weight" in all_names
    assert "model.0.bn.running_mean" in all_names
    assert any(n.startswith("model.6.m.0.0.attn.qkv.conv.weight")
               for n in all_names), sorted(
                   n for n in all_names if n.startswith("model.6"))[:5]


def test_synthetic_round_trip_detection():
    """Fabricate a torch state_dict from our tree (torch layouts), convert it
    back, and verify every leaf lands unchanged in the right place."""
    _, variables = cached_init("yolov12", "n", task="segment", ch=4, nc=1)
    sd = {}
    rng = np.random.default_rng(0)
    for coll in ("params", "batch_stats"):
        for path, leaf in _flat(variables[coll]):
            t = flax_to_torch_name(path, coll)
            sd[t] = rng.normal(size=_torch_layout(leaf, path).shape).astype(np.float32)
    out, report = convert_state_dict(sd, variables, strict=True)
    assert report["matched"] > 300
    assert not report["unused"], report["unused"][:5]
    from yolou_tpu.tools.torch2jax import aattn_qkv_permutation
    for coll in ("params", "batch_stats"):
        for path, leaf in _flat(out[coll]):
            t = flax_to_torch_name(path, coll)
            want = _torch_layout(leaf, path)
            src = sd[t]
            if path[-4:-2] == ("attn", "qkv") or (
                    len(path) >= 3 and path[-3] == "qkv" and "attn" in path):
                # AAttn qkv: converter permutes head-major -> role-major
                o = want.shape[0]
                if o % 96 == 0:  # 3*heads*32 (PSA's qkv width never is)
                    src = src[aattn_qkv_permutation(o)]
            np.testing.assert_allclose(want, src, err_msg=str(path))


def test_load_plain_torch_file(tmp_path):
    p = str(tmp_path / "sd.pt")
    torch.save({"a.weight": torch.ones(2, 3)}, p)
    sd = load_torch_state_dict(p)
    assert sd["a.weight"].shape == (2, 3)
