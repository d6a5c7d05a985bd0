"""Import/export between reference (PyTorch) FCDenseNet checkpoints and
Flax variables.

Import lets users of the reference framework bring their trained models
(``checkpoint_model_epoch_*.pt`` written by reference utils.py:674-682)
straight into this one; export writes a ``.pt`` the reference's own
train.py/evaluate.py can load (``state['model']`` with the DataParallel
``module.`` prefix, reference train.py:197,220) — full two-way interop.
Pure numpy mapping — torch is only needed to (de)serialize ``.pt`` files.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(weight, bias):
    # torch OIHW -> flax HWIO
    return {"kernel": _np(weight).transpose(2, 3, 1, 0), "bias": _np(bias)}


def convert_reference_state_dict(state_dict: Mapping[str, "np.ndarray"],
                                 down_blocks=(4, 4, 4, 4, 4),
                                 up_blocks=(4, 4, 4, 4, 4),
                                 bottleneck_layers: int = 4) -> Dict:
    """Convert a reference FCDenseNet ``state_dict`` (optionally with the
    DataParallel ``module.`` prefix, reference train.py:197) into
    ``{'params': ..., 'batch_stats': ...}`` for our Flax FCDenseNet.
    """
    sd = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        sd[key] = value

    params: Dict = {}
    stats: Dict = {}

    def put_bn(flax_scope, torch_prefix):
        p = flax_scope.setdefault("norm", {})
        p["scale"] = _np(sd[f"{torch_prefix}.weight"])
        p["bias"] = _np(sd[f"{torch_prefix}.bias"])
        s = stats
        for part in flax_scope["__path__"]:
            s = s.setdefault(part, {})
        s["norm"] = {"mean": _np(sd[f"{torch_prefix}.running_mean"]),
                     "var": _np(sd[f"{torch_prefix}.running_var"])}

    def scope(*path):
        node = params
        for part in path:
            node = node.setdefault(part, {})
        node["__path__"] = path
        return node

    params["firstconv"] = _conv(sd["firstconv.weight"], sd["firstconv.bias"])

    def dense_block(flax_name, torch_prefix, n_layers):
        for j in range(n_layers):
            layer = scope(flax_name, f"layers{j}")
            put_bn(layer, f"{torch_prefix}.layers.{j}.norm")
            layer["conv"] = _conv(sd[f"{torch_prefix}.layers.{j}.conv.weight"],
                                  sd[f"{torch_prefix}.layers.{j}.conv.bias"])

    for i, n in enumerate(down_blocks):
        dense_block(f"denseBlocksDown{i}", f"denseBlocksDown.{i}", n)
        td = scope(f"transDownBlocks{i}")
        put_bn(td, f"transDownBlocks.{i}.norm")
        td["conv"] = _conv(sd[f"transDownBlocks.{i}.conv.weight"],
                           sd[f"transDownBlocks.{i}.conv.bias"])

    dense_block("bottleneck", "bottleneck.bottleneck", bottleneck_layers)

    for i, n in enumerate(up_blocks):
        tu = scope(f"transUpBlocks{i}")
        tu["conv"] = _conv(sd[f"transUpBlocks.{i}.convTrans.1.weight"],
                           sd[f"transUpBlocks.{i}.convTrans.1.bias"])
        dense_block(f"denseBlocksUp{i}", f"denseBlocksUp.{i}", n)

    params["finalConv"] = _conv(sd["finalConv.weight"], sd["finalConv.bias"])

    def strip(node):
        if isinstance(node, dict):
            node.pop("__path__", None)
            for v in node.values():
                strip(v)

    strip(params)
    return {"params": params, "batch_stats": stats}


def export_reference_state_dict(params: Mapping, batch_stats: Mapping,
                                down_blocks=(4, 4, 4, 4, 4),
                                up_blocks=(4, 4, 4, 4, 4),
                                bottleneck_layers: int = 4,
                                module_prefix: bool = True) -> Dict:
    """Inverse of :func:`convert_reference_state_dict`: our Flax variables
    -> a torch ``state_dict`` (numpy values) the reference FCDenseNet
    accepts. ``module_prefix`` adds DataParallel's ``module.`` prefix,
    which the reference's own checkpoints carry (train.py:197)."""
    sd: Dict = {}

    def put_conv(torch_prefix, node):
        # flax HWIO -> torch OIHW
        sd[f"{torch_prefix}.weight"] = _np(node["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{torch_prefix}.bias"] = _np(node["bias"])

    def put_bn(torch_prefix, p_node, s_node):
        sd[f"{torch_prefix}.weight"] = _np(p_node["scale"])
        sd[f"{torch_prefix}.bias"] = _np(p_node["bias"])
        sd[f"{torch_prefix}.running_mean"] = _np(s_node["mean"])
        sd[f"{torch_prefix}.running_var"] = _np(s_node["var"])
        # torch BatchNorm2d tracks this buffer; only consumed when
        # momentum=None (reference uses the default 0.1), so 0 is inert
        sd[f"{torch_prefix}.num_batches_tracked"] = np.asarray(0, np.int64)

    put_conv("firstconv", params["firstconv"])

    def dense_block(flax_name, torch_prefix, n_layers):
        for j in range(n_layers):
            p = params[flax_name][f"layers{j}"]
            s = batch_stats[flax_name][f"layers{j}"]
            put_bn(f"{torch_prefix}.layers.{j}.norm", p["norm"], s["norm"])
            put_conv(f"{torch_prefix}.layers.{j}.conv", p["conv"])

    for i, n in enumerate(down_blocks):
        dense_block(f"denseBlocksDown{i}", f"denseBlocksDown.{i}", n)
        put_bn(f"transDownBlocks.{i}.norm",
               params[f"transDownBlocks{i}"]["norm"],
               batch_stats[f"transDownBlocks{i}"]["norm"])
        put_conv(f"transDownBlocks.{i}.conv",
                 params[f"transDownBlocks{i}"]["conv"])

    dense_block("bottleneck", "bottleneck.bottleneck", bottleneck_layers)

    for i, n in enumerate(up_blocks):
        put_conv(f"transUpBlocks.{i}.convTrans.1",
                 params[f"transUpBlocks{i}"]["conv"])
        dense_block(f"denseBlocksUp{i}", f"denseBlocksUp.{i}", n)

    put_conv("finalConv", params["finalConv"])

    if module_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    return sd


def save_reference_checkpoint(path, variables: Mapping, epoch: int = 0,
                              step: int = 0, validation: float = 0.0,
                              down_blocks=(4, 4, 4, 4, 4),
                              up_blocks=(4, 4, 4, 4, 4),
                              bottleneck_layers: int = 4) -> None:
    """Write a reference-format ``.pt`` checkpoint (utils.py:674-682 layout:
    {'model', 'optimizer', 'epoch', 'step', 'validation'}) from our Flax
    ``{'params', 'batch_stats'}`` variables. The reference restores only
    'model'/'epoch'/'step' (train.py:214-227), so 'optimizer' is an empty
    state_dict-shaped stub."""
    import torch  # local import: torch only needed for serialization
    sd = export_reference_state_dict(
        variables["params"], variables["batch_stats"],
        down_blocks, up_blocks, bottleneck_layers)
    model_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}
    torch.save({"model": model_sd,
                "optimizer": {"state": {}, "param_groups": []},
                "epoch": int(epoch), "step": int(step),
                "validation": float(validation)}, str(path))


def load_reference_checkpoint(path, down_blocks=(4, 4, 4, 4, 4),
                              up_blocks=(4, 4, 4, 4, 4), bottleneck_layers: int = 4):
    """Load a reference ``.pt`` checkpoint file (requires torch)."""
    import torch  # local import: torch only needed for deserialization
    state = torch.load(str(path), map_location="cpu", weights_only=False)
    model_sd = state["model"] if isinstance(state, dict) and "model" in state else state
    variables = convert_reference_state_dict(model_sd, down_blocks, up_blocks,
                                             bottleneck_layers)
    meta = {k: state.get(k) for k in ("epoch", "step", "validation")} \
        if isinstance(state, dict) else {}
    return variables, meta
