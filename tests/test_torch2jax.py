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


def test_reverse_round_trip_identity():
    """jax -> torch -> jax must reproduce every leaf bit-exactly, with the
    qkv permutation and all layout transposes inverting cleanly."""
    from yolou_tpu.tools.torch2jax import jax_to_torch_state_dict

    _, variables = cached_init("yolov12", "n", task="segment", ch=4, nc=1)
    variables = {c: variables[c] for c in ("params", "batch_stats")}
    sd = jax_to_torch_state_dict(variables)
    out, report = convert_state_dict(sd, variables, strict=True)
    assert not report["missing"] and not report["unused"]
    orig = dict(_flat(variables["params"])) | dict(_flat(variables["batch_stats"]))
    back = dict(_flat(out["params"])) | dict(_flat(out["batch_stats"]))
    assert orig.keys() == back.keys()
    for path in orig:
        np.testing.assert_array_equal(np.asarray(orig[path], np.float32),
                                      back[path], err_msg=str(path))


def test_reverse_export_matches_released_keyset():
    """The reverse export of an nc=80/ch=3 segment model must be key-for-key
    AND shape-for-shape identical to the released ultralytics state_dict
    listing — the drop-in-back-to-torch guarantee."""
    import jax
    import jax.numpy as jnp

    from yolou_tpu.models.yolo import build_yolo
    from yolou_tpu.tools.torch2jax import jax_to_torch_state_dict
    from .test_released_keyset import load_fixture, CASES

    for arch in ("yolov12", "yolov8", "yolo11"):
        released = load_fixture(CASES[arch][0])
        model = build_yolo(arch, "n", nc=80, ch=3, task="segment")
        template = jax.eval_shape(
            lambda m=model: m.init(jax.random.key(0),
                                   jnp.zeros((1, 64, 64, 3)), train=False))
        variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
        sd = jax_to_torch_state_dict(
            {c: variables[c] for c in ("params", "batch_stats")})
        missing = sorted(set(released) - set(sd))
        extra = sorted(set(sd) - set(released))
        assert not missing, f"{arch}: not exported: {missing[:8]}"
        assert not extra, f"{arch}: not in release: {extra[:8]}"
        for k, shape in released.items():
            assert tuple(sd[k].shape) == shape, (
                f"{arch}: {k} exported {sd[k].shape} vs released {shape}")


def test_reverse_segpp_prefixes():
    """SegPP reverse export uses the reference's encoder./decoder./output.
    naming (train.py:428 state_dict layout)."""
    import jax
    import jax.numpy as jnp

    from yolou_tpu.models.segpp import YOLOSegPP
    from yolou_tpu.models.yolo import parse_model_spec
    from yolou_tpu.tools.torch2jax import jax_to_torch_state_dict

    spec = parse_model_spec("yolov12", "n", 1, 4, "detect")
    model = YOLOSegPP(spec=spec)
    variables = jax.device_get(jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 160, 160, 4)),
                           train=False)))
    variables = jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype), variables)
    sd = jax_to_torch_state_dict(
        {c: variables[c] for c in ("params", "batch_stats")},
        prefix_map={"yolo.model": "encoder"})
    prefixes = {k.split(".")[0] for k in sd}
    assert "encoder" in prefixes and "output" in prefixes, sorted(prefixes)[:6]
    assert any(k.startswith("decoder.") for k in sd)
    assert not any(k.startswith("yolo.") for k in sd), sorted(
        k for k in sd if k.startswith("yolo."))[:5]


def test_segpp_full_round_trip():
    """Full YOLOSegPP (encoder+decoder+output) through export -> strict
    re-import with the reference prefix map — the --kind segpp CLI path.
    Locks the decoder-wrapper stripping (names must be encoder./decoder.{i}./
    output.*, never decoder.decoder.*)."""
    import jax
    import jax.numpy as jnp

    from yolou_tpu.models.segpp import YOLOSegPP
    from yolou_tpu.models.yolo import parse_model_spec
    from yolou_tpu.tools.torch2jax import jax_to_torch_state_dict

    spec = parse_model_spec("yolov12", "n", 1, 4, "detect")
    model = YOLOSegPP(spec=spec)
    template = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 160, 160, 4)),
                           train=False))
    rng = np.random.default_rng(3)
    variables = jax.tree.map(
        lambda s: rng.normal(size=s.shape).astype(s.dtype)
        if np.issubdtype(s.dtype, np.floating)
        else np.zeros(s.shape, s.dtype), template)
    variables = {c: variables[c] for c in ("params", "batch_stats")}
    pm = {"yolo.model": "encoder"}
    sd = jax_to_torch_state_dict(variables, prefix_map=pm)
    assert not any(k.startswith("decoder.decoder.") for k in sd)
    out, report = convert_state_dict(sd, variables, prefix_map=pm, strict=True)
    assert not report["unused"], report["unused"][:5]
    orig = dict(_flat(variables["params"]))
    back = dict(_flat(out["params"]))
    for path in orig:
        np.testing.assert_array_equal(orig[path].astype(np.float32),
                                      back[path], err_msg=str(path))


def test_reverse_cli(tmp_path):
    """convert --reverse end-to-end: ckpt -> .pt -> re-import == identity."""
    from yolou_tpu.cli.convert import main as convert_main
    from yolou_tpu.utils.model_io import save_model

    _, variables = cached_init("yolov12", "n", task="segment", ch=4, nc=1)
    variables = {c: variables[c] for c in ("params", "batch_stats")}
    ck = str(tmp_path / "m.ckpt")
    pt = str(tmp_path / "m.pt")
    save_model(ck, variables, arch="yolov12", variant="n", nc=1, ch=4,
               task="segment")
    convert_main(["--reverse", "--out", ck, "--pt", pt])
    sd = load_torch_state_dict(pt)
    assert "model.0.conv.weight" in sd
    out, report = convert_state_dict(sd, variables, strict=True)
    assert not report["missing"] and not report["unused"]
