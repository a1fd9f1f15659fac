"""Export lidog_tpu params back into reference Lightning checkpoints.

Inverse of utils/torch_import.py: walks the `backbone` (+ encoder2d_*)
param/batch_stats trees and emits a `state_dict` under the reference's
module names (utils/models/minkunet.py:26-95, conv2d.py:180-197,
trainer_lighting.py checkpoint layout), so weights trained here can be
evaluated or fine-tuned with the reference's torch tooling —
`import(export(params)) == params` exactly (tests/test_torch_export.py).

BatchNorm `num_batches_tracked` counters (present in torch state_dicts,
unused by eval) are emitted as zeros so `load_state_dict(strict=True)`
passes.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from lidog_tpu.utils.torch_import import _offset_perm


def _inv_conv(w, kernel_k: int, me_x_fastest: bool):
    w = np.asarray(w, np.float32)
    if kernel_k > 1:
        w = w[np.argsort(_offset_perm(kernel_k, me_x_fastest))]
    return w


def _put_bn(sd, ref, p, s):
    sd[ref + ".bn.weight"] = np.asarray(p["scale"], np.float32)
    sd[ref + ".bn.bias"] = np.asarray(p["bias"], np.float32)
    sd[ref + ".bn.running_mean"] = np.asarray(s["mean"], np.float32)
    sd[ref + ".bn.running_var"] = np.asarray(s["var"], np.float32)
    sd[ref + ".bn.num_batches_tracked"] = np.zeros((), np.int64)


def export_minkunet34(
    params: Dict,
    batch_stats: Dict,
    layers=(2, 3, 4, 6, 2, 2, 2, 2),
    prefix: str = "model.",
    me_x_fastest: bool = True,
) -> Dict[str, np.ndarray]:
    """`backbone` params/batch_stats subtrees -> reference state_dict
    (numpy values; `save_reference_checkpoint` wraps them in torch)."""
    sd: Dict[str, np.ndarray] = {}
    sd["conv0p1s1.kernel"] = _inv_conv(
        params["conv0"]["kernel"], 5, me_x_fastest
    )
    _put_bn(sd, "bn0", params["norm0"]["bn"], batch_stats["norm0"]["bn"])
    enc_names = ["conv1p1s2", "conv2p2s2", "conv3p4s2", "conv4p8s2"]
    for s in range(4):
        sd[enc_names[s] + ".kernel"] = _inv_conv(
            params[f"conv{s+1}"]["kernel"], 2, me_x_fastest
        )
        _put_bn(sd, f"bn{s+1}", params[f"norm{s+1}"]["bn"],
                batch_stats[f"norm{s+1}"]["bn"])
    tr_names = ["convtr4p16s2", "convtr5p8s2", "convtr6p4s2", "convtr7p2s2"]
    for d in range(4):
        sd[tr_names[d] + ".kernel"] = _inv_conv(
            params[f"convtr{4+d}"]["kernel"], 2, me_x_fastest
        )
        _put_bn(sd, f"bntr{4+d}", params[f"normtr{4+d}"]["bn"],
                batch_stats[f"normtr{4+d}"]["bn"])

    for j, n_blocks in zip(range(1, 9), layers):
        for i in range(n_blocks):
            base = f"block{j}.{i}"
            name = f"block{j}_{i}"
            p, st = params[name], batch_stats[name]
            sd[base + ".conv1.kernel"] = _inv_conv(
                p["conv1"]["kernel"], 3, me_x_fastest
            )
            sd[base + ".conv2.kernel"] = _inv_conv(
                p["conv2"]["kernel"], 3, me_x_fastest
            )
            for norm in ("norm1", "norm2"):
                _put_bn(sd, f"{base}.{norm}", p[norm]["bn"], st[norm]["bn"])
            if "shortcut_conv" in p:
                sd[base + ".downsample.0.kernel"] = np.asarray(
                    p["shortcut_conv"]["kernel"], np.float32
                )
                _put_bn(sd, base + ".downsample.1",
                        p["shortcut_norm"]["bn"], st["shortcut_norm"]["bn"])

    sd["final.kernel"] = np.asarray(params["final"]["kernel"], np.float32)
    sd["final.bias"] = np.asarray(params["final"]["bias"], np.float32)
    return {prefix + k: v for k, v in sd.items()}


def _inv_conv2d(w):
    """flax [kh, kw, Cin, Cout] -> torch [Cout, Cin, kh, kw]."""
    return np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1))


def export_encoder2d(
    params: Dict, batch_stats: Dict, level: str = "block8",
    prefix: str = "model.",
) -> Dict[str, np.ndarray]:
    """encoder2d_<level> params/batch_stats -> reference state_dict keys."""
    sd: Dict[str, np.ndarray] = {}
    base = f"encoders2d.{level}.down1.maxpool_conv.0.double_conv"
    for i, (ci, bi) in enumerate(((0, 1), (3, 4))):
        sd[f"{base}.{ci}.weight"] = _inv_conv2d(
            params["down1"][f"conv{i}"]["kernel"]
        )
        bn_p = params["down1"][f"bn{i}"]
        bn_s = batch_stats["down1"][f"bn{i}"]
        sd[f"{base}.{bi}.weight"] = np.asarray(bn_p["scale"], np.float32)
        sd[f"{base}.{bi}.bias"] = np.asarray(bn_p["bias"], np.float32)
        sd[f"{base}.{bi}.running_mean"] = np.asarray(
            bn_s["mean"], np.float32
        )
        sd[f"{base}.{bi}.running_var"] = np.asarray(bn_s["var"], np.float32)
        sd[f"{base}.{bi}.num_batches_tracked"] = np.zeros((), np.int64)
    oc = f"encoders2d.{level}.out_conv.conv"
    sd[oc + ".weight"] = _inv_conv2d(params["out_conv"]["kernel"])
    sd[oc + ".bias"] = np.asarray(params["out_conv"]["bias"], np.float32)
    if "binary_out_conv" in params:  # binary_segmentation_layer heads
        bc = f"encoders2d.{level}.binary_out_conv.conv"
        sd[bc + ".weight"] = _inv_conv2d(params["binary_out_conv"]["kernel"])
        sd[bc + ".bias"] = np.asarray(
            params["binary_out_conv"]["bias"], np.float32
        )
    return {prefix + k: v for k, v in sd.items()}


def save_reference_checkpoint(
    path: str,
    variables: Dict,
    model_name: str = "MinkUNet34",
    me_x_fastest: bool = True,
) -> str:
    """Write a Lightning-compatible `.ckpt` from a lidog_tpu variables
    dict ({'params': ..., 'batch_stats': ...}) — the reverse of
    `torch_import.load_reference_checkpoint`."""
    import torch

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd = export_minkunet34(
        params["backbone"], stats["backbone"], me_x_fastest=me_x_fastest
    )
    if model_name == "MinkUNet34BEV":
        for key in params:
            if key.startswith("encoder2d_"):
                lvl = key[len("encoder2d_"):]
                sd.update(export_encoder2d(params[key], stats[key], lvl))
    ckpt = {
        "state_dict": {
            k: torch.from_numpy(np.array(v)) for k, v in sd.items()
        },
        "epoch": 0,
        "global_step": 0,
    }
    torch.save(ckpt, path)
    return path
