"""Import reference (PyTorch YOLOX) checkpoints into cocodet_tpu param trees.

Two jobs:
  1. convert real reference checkpoints (tools/train.py outputs,
     merge_save*.py BN-folded zoos, 03_jh_merge sparse-COO — ref
     README.md:57-78 artifact chain) into this framework's variables;
  2. power the numeric parity tests: build the torch reference model, copy
     its weights here, and compare forward outputs (tests/test_torch_parity.py).

Name mapping (torch state-dict prefix -> flax path):
  backbone.backbone.stem.conv            -> backbone/backbone/stem/conv
  backbone.backbone.darkN.0              -> backbone/backbone/darkN_down
  backbone.backbone.darkN.{1|2} (SPP/CSP)-> backbone/backbone/darkN_{spp|csp}
  CSP: conv1/conv2/conv3/m.i             -> conv1/conv2/conv3/m{i}
  PAFPN (L levels, ref yolo_pafpn_p6.py:29-141):
    lateral_conv0 -> lateral{L-1}, lateral_conv1 -> lateral{L-2},
    reduce_conv1  -> lateral1,
    C3_p5/C3_p4/C3_p3 -> td_csp{3,2,1}, C3_n3/C3_n4/C3_n5 -> bu_csp{1,2,3},
    bu_conv2/bu_conv1/bu_conv0 -> bu_conv{1,2,3}
  head (ref yolo_head_custom.py:38-113):
    stems.k -> stem{k}, cls_convs.k.j -> cls_conv{k}_{j}, reg_convs likewise,
    {cls,reg,obj}_preds.k -> {cls,reg,obj}_pred{k}

Tensor transforms: conv OIHW -> HWIO; BN weight/bias/running_mean/running_var
-> scale/bias/mean/var.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from flax.traverse_util import unflatten_dict

from .logger import logger


def _map_pafpn_name(part: str, num_levels: int) -> str:
    l = num_levels
    table = {
        "lateral_conv0": f"lateral{l - 1}",
        "lateral_conv1": f"lateral{l - 2}",
        "reduce_conv1": "lateral1",
        "C3_p5": "td_csp3",
        "C3_p4": "td_csp2" if l == 4 else "td_csp2",
        "C3_p3": "td_csp1",
        "C3_n3": "bu_csp1",
        "C3_n4": "bu_csp2",
        "C3_n5": "bu_csp3",
        "bu_conv2": "bu_conv1",
        "bu_conv1": "bu_conv2",
        "bu_conv0": "bu_conv3",
    }
    return table.get(part, part)


def _map_backbone_stage(stage: str, idx: str, has_spp: bool) -> str:
    """darkN.{0,1,2} -> darkN_{down,spp?,csp}."""
    i = int(idx)
    if i == 0:
        return f"{stage}_down"
    if has_spp:
        return f"{stage}_spp" if i == 1 else f"{stage}_csp"
    return f"{stage}_csp"


# which stages contain an SPP block, per variant (see darknet.BACKBONE_STAGES)
_SPP_STAGES = {
    "standard": {"dark5"},
    "custom": {"dark5"},
    "p6": {"dark6"},
    "p6v2": {"dark6"},
}


def map_torch_key(key: str, variant: str = "p6",
                  num_levels: int = 4) -> Tuple[Tuple[str, ...], str]:
    """Map one torch state-dict key to (flax path tuple, collection).

    collection is "params", "batch_stats", or "skip" (num_batches_tracked).
    """
    if key.endswith("num_batches_tracked"):
        return (), "skip"
    parts = key.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("backbone",) and i <= 1:
            out.append("backbone")
            i += 1
            continue
        m = re.fullmatch(r"dark\d", p)
        if m and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(_map_backbone_stage(p, parts[i + 1],
                                           p in _SPP_STAGES[variant]))
            i += 2
            continue
        if p == "stem" and parts[i + 1] == "conv":
            out.append("stem")
            i += 1
            continue
        if p == "m" and parts[i + 1].isdigit():
            out.append(f"m{parts[i + 1]}")
            i += 2
            continue
        if p in ("stems", "cls_convs", "reg_convs", "cls_preds",
                 "reg_preds", "obj_preds"):
            k = parts[i + 1]
            if p == "stems":
                out.append(f"stem{k}")
                i += 2
            elif p in ("cls_convs", "reg_convs"):
                j = parts[i + 2]
                out.append(f"{p[:-1]}{k}_{j}")
                i += 3
            else:
                out.append(f"{p[:-1]}{k}")
                i += 2
            continue
        out.append(_map_pafpn_name(p, num_levels))
        i += 1

    # leaf renames
    leaf = out[-1]
    if len(out) >= 2 and out[-2] == "bn":
        rename = {"weight": "scale", "bias": "bias",
                  "running_mean": "mean", "running_var": "var"}
        out[-1] = rename[leaf]
        coll = "batch_stats" if leaf.startswith("running") else "params"
        return tuple(out), coll
    if leaf == "weight":
        out[-1] = "kernel"
    return tuple(out), "params"


def convert_state_dict(state_dict: Dict[str, Any], variant: str = "p6",
                       num_levels: int = 4) -> Dict[str, Any]:
    """Torch state dict (possibly with 'model.' / 'module.' prefixes, sparse
    COO tensors per ref 03_jh_merge.py:66-87) -> flax variables dict."""
    import torch

    flat: Dict[str, Dict[Tuple[str, ...], np.ndarray]] = {
        "params": {}, "batch_stats": {}}
    for key, value in state_dict.items():
        for pre in ("module.", "model."):
            if key.startswith(pre):
                key = key[len(pre):]
        if isinstance(value, torch.Tensor):
            if value.is_sparse:
                value = value.to_dense()
            value = value.detach().cpu().numpy()
        path, coll = map_torch_key(key, variant, num_levels)
        if coll == "skip":
            continue
        if path[-1] == "kernel" and value.ndim == 4:
            value = value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        flat[coll][path] = value

    out = {"params": unflatten_dict(flat["params"])}
    if flat["batch_stats"]:
        out["batch_stats"] = unflatten_dict(flat["batch_stats"])
    return out


def load_torch_checkpoint(path: str, variant: str = "p6",
                          num_levels: int = 4) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu")
    state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    logger.info("importing %d torch tensors from %s", len(state), path)
    return convert_state_dict(state, variant, num_levels)


# --------------------------------------------------------------------------
# reverse direction: flax variables -> reference torch state dict
# (the "hand the model to another runtime" export — any torch YOLOX runtime,
# and from there ONNX/TorchScript/TensorRT, can consume the result)
# --------------------------------------------------------------------------


def _inv_pafpn_name(part: str, num_levels: int) -> str:
    l = num_levels
    table = {
        f"lateral{l - 1}": "lateral_conv0",
        f"lateral{l - 2}": "lateral_conv1",
        "lateral1": "reduce_conv1",
        "td_csp3": "C3_p5",
        "td_csp2": "C3_p4",
        "td_csp1": "C3_p3",
        "bu_csp1": "C3_n3",
        "bu_csp2": "C3_n4",
        "bu_csp3": "C3_n5",
        "bu_conv1": "bu_conv2",
        "bu_conv2": "bu_conv1",
        "bu_conv3": "bu_conv0",
    }
    return table.get(part, part)


def map_flax_path(path: Tuple[str, ...], collection: str,
                  variant: str = "p6", num_levels: int = 4) -> str:
    """Inverse of map_torch_key: flax (path, collection) -> torch key."""
    parts = []
    for comp in path[:-1]:
        m = re.fullmatch(r"(dark\d)_(down|spp|csp)", comp)
        if m:
            stage, kind = m.groups()
            has_spp = stage in _SPP_STAGES[variant]
            idx = {"down": 0, "spp": 1,
                   "csp": 2 if has_spp else 1}[kind]
            parts.append(f"{stage}.{idx}")
            continue
        m = re.fullmatch(r"m(\d+)", comp)
        if m:
            parts.append(f"m.{m.group(1)}")
            continue
        m = re.fullmatch(r"(cls|reg)_conv(\d+)_(\d+)", comp)
        if m:
            t, k, j = m.groups()
            parts.append(f"{t}_convs.{k}.{j}")
            continue
        m = re.fullmatch(r"(cls|reg|obj)_pred(\d+)", comp)
        if m:
            parts.append(f"{m.group(1)}_preds.{m.group(2)}")
            continue
        m = re.fullmatch(r"stem(\d+)", comp)
        if m:
            parts.append(f"stems.{m.group(1)}")
            continue
        parts.append(_inv_pafpn_name(comp, num_levels))

    leaf = path[-1]
    if collection == "batch_stats":
        parts.append({"mean": "running_mean", "var": "running_var"}[leaf])
    elif len(path) >= 2 and path[-2] == "bn":
        parts.append({"scale": "weight", "bias": "bias"}[leaf])
    else:
        parts.append({"kernel": "weight", "bias": "bias"}.get(leaf, leaf))
    return ".".join(parts)


def export_state_dict(variables: Dict[str, Any], variant: str = "p6",
                      num_levels: int = 4) -> Dict[str, Any]:
    """Flax variables -> a torch state dict in the reference's naming
    (loadable by ref yolox/models YOLOXCustomP6 etc. with strict=False for
    num_batches_tracked buffers)."""
    import torch

    from flax.traverse_util import flatten_dict

    out: Dict[str, Any] = {}
    for coll in ("params", "batch_stats"):
        for path, v in flatten_dict(variables.get(coll, {})).items():
            key = map_flax_path(path, coll, variant, num_levels)
            arr = np.asarray(v, np.float32)
            if path[-1] == "kernel" and arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            out[key] = torch.from_numpy(np.ascontiguousarray(arr))
    return out
