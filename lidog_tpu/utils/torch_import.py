"""Import reference PyTorch-Lightning checkpoints into lidog_tpu params.

The reference releases Lightning `.ckpt` files whose `state_dict` holds
MinkowskiEngine modules under `model.*` (trainer_lighting.py
`save_hyperparameters(ignore='model')`; module names from
utils/models/minkunet.py:26-95).  ME convolution kernels are stored as
[K^3, Cin, Cout] — the same layout this framework uses — so the import is a
name remap plus (a) a kernel-offset-axis permutation between ME's
first-coordinate-fastest region enumeration and our z-fastest
itertools.product order, and (b) HWio transposes for the dense 2D heads.

Known assumption (documented, switchable): ME's hypercube region iterator
enumerates the FIRST coordinate fastest.  If a real checkpoint evaluates
wrong, set `me_x_fastest=False` to disable the permutation.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _offset_perm(k: int, me_x_fastest: bool = True) -> np.ndarray:
    """perm[ours] = ME index holding the same spatial offset."""
    if not me_x_fastest:
        return np.arange(k**3)
    # ours: index = ((ix * k) + iy) * k + iz  (z fastest)
    # ME:   index = ((iz * k) + iy) * k + ix  (x fastest)
    perm = np.empty(k**3, np.int64)
    for ix in range(k):
        for iy in range(k):
            for iz in range(k):
                ours = (ix * k + iy) * k + iz
                me = (iz * k + iy) * k + ix
                perm[ours] = me
    return perm


def _conv(sd, name, kernel_k, me_x_fastest):
    w = np.asarray(sd[name])
    if kernel_k > 1:
        w = w[_offset_perm(kernel_k, me_x_fastest)]
    return w.astype(np.float32)


def _bn(sd, prefix):
    return (
        {"scale": np.asarray(sd[prefix + ".bn.weight"], np.float32),
         "bias": np.asarray(sd[prefix + ".bn.bias"], np.float32)},
        {"mean": np.asarray(sd[prefix + ".bn.running_mean"], np.float32),
         "var": np.asarray(sd[prefix + ".bn.running_var"], np.float32)},
    )


def import_minkunet34(
    state_dict: Dict[str, np.ndarray],
    layers=(2, 3, 4, 6, 2, 2, 2, 2),
    prefix: str = "model.",
    me_x_fastest: bool = True,
):
    """Reference MinkUNet34 state_dict -> (params, batch_stats) subtrees
    for the `backbone` module."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    params: Dict = {}
    stats: Dict = {}

    def put_bn(our, ref):
        p, s = _bn(sd, ref)
        params[our] = {"bn": p}
        stats[our] = {"bn": s}

    params["conv0"] = {"kernel": _conv(sd, "conv0p1s1.kernel", 5, me_x_fastest)}
    put_bn("norm0", "bn0")
    enc_names = ["conv1p1s2", "conv2p2s2", "conv3p4s2", "conv4p8s2"]
    for s in range(4):
        params[f"conv{s+1}"] = {
            "kernel": _conv(sd, enc_names[s] + ".kernel", 2, me_x_fastest)
        }
        put_bn(f"norm{s+1}", f"bn{s+1}")
    tr_names = ["convtr4p16s2", "convtr5p8s2", "convtr6p4s2", "convtr7p2s2"]
    for d in range(4):
        params[f"convtr{4+d}"] = {
            "kernel": _conv(sd, tr_names[d] + ".kernel", 2, me_x_fastest)
        }
        put_bn(f"normtr{4+d}", f"bntr{4+d}")

    for j, n_blocks in zip(range(1, 9), layers):
        for i in range(n_blocks):
            base = f"block{j}.{i}"
            name = f"block{j}_{i}"
            params[name] = {
                "conv1": {"kernel": _conv(sd, base + ".conv1.kernel", 3, me_x_fastest)},
                "conv2": {"kernel": _conv(sd, base + ".conv2.kernel", 3, me_x_fastest)},
            }
            stats[name] = {}
            for norm in ("norm1", "norm2"):
                p, s = _bn(sd, f"{base}.{norm}")
                params[name][norm] = {"bn": p}
                stats[name][norm] = {"bn": s}
            if base + ".downsample.0.kernel" in sd:
                params[name]["shortcut_conv"] = {
                    "kernel": np.asarray(
                        sd[base + ".downsample.0.kernel"], np.float32
                    )
                }
                p, s = _bn(sd, base + ".downsample.1")
                params[name]["shortcut_norm"] = {"bn": p}
                stats[name]["shortcut_norm"] = {"bn": s}

    params["final"] = {
        "kernel": np.asarray(sd["final.kernel"], np.float32),
        "bias": np.asarray(sd["final.bias"], np.float32),
    }
    return params, stats


def _conv2d(sd, name):
    """torch [Cout, Cin, kh, kw] -> flax [kh, kw, Cin, Cout]."""
    return np.transpose(np.asarray(sd[name], np.float32), (2, 3, 1, 0))


def import_encoder2d(state_dict, level: str = "block8", prefix: str = "model."):
    """Reference Encoder2D head -> params/batch_stats for encoder2d_<level>."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    base = f"encoders2d.{level}.down1.maxpool_conv.0.double_conv"
    params = {"down1": {}, "out_conv": {}}
    stats = {"down1": {}}
    for i, (ci, bi) in enumerate(((0, 1), (3, 4))):
        params["down1"][f"conv{i}"] = {"kernel": _conv2d(sd, f"{base}.{ci}.weight")}
        params["down1"][f"bn{i}"] = {
            "scale": np.asarray(sd[f"{base}.{bi}.weight"], np.float32),
            "bias": np.asarray(sd[f"{base}.{bi}.bias"], np.float32),
        }
        stats["down1"][f"bn{i}"] = {
            "mean": np.asarray(sd[f"{base}.{bi}.running_mean"], np.float32),
            "var": np.asarray(sd[f"{base}.{bi}.running_var"], np.float32),
        }
    oc = f"encoders2d.{level}.out_conv.conv"
    params["out_conv"] = {
        "kernel": _conv2d(sd, oc + ".weight"),
        "bias": np.asarray(sd[oc + ".bias"], np.float32),
    }
    bc = f"encoders2d.{level}.binary_out_conv.conv"
    if bc + ".weight" in sd:  # binary_segmentation_layer heads
        params["binary_out_conv"] = {
            "kernel": _conv2d(sd, bc + ".weight"),
            "bias": np.asarray(sd[bc + ".bias"], np.float32),
        }
    return params, stats


def load_reference_checkpoint(path: str, model_name: str = "MinkUNet34",
                              me_x_fastest: bool = True):
    """Load a Lightning .ckpt file (torch) into (params, batch_stats) trees
    shaped like our models' `backbone` (+ encoder2d_* for the BEV model)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    backbone_p, backbone_s = import_minkunet34(sd, me_x_fastest=me_x_fastest)
    params = {"backbone": backbone_p}
    stats = {"backbone": backbone_s}
    if model_name == "MinkUNet34BEV":
        levels = sorted(
            {k.split(".")[2] for k in sd if k.startswith("model.encoders2d.")}
        )
        for lvl in levels:
            p, s = import_encoder2d(sd, lvl)
            params[f"encoder2d_{lvl}"] = p
            stats[f"encoder2d_{lvl}"] = s
    return params, stats
