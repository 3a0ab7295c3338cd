"""Import torchvision ResNet / reference NLSPN checkpoints into our params.

The reference loads ImageNet-pretrained resnet18/34 state_dicts from local
``pretrained/*.pth`` files (/root/reference/src/model/common.py:21-42) and
its released model checkpoints are torch ``{net: state_dict, args}`` saves
(main.py:263-275). This module maps those tensors into the Flax parameter
tree so released weights remain usable.

Weight layout conversions:
  torch Conv2d weight (O, I, kH, kW)         -> HWIO (kH, kW, I, O)
  torch ConvTranspose2d weight (I, O, kH, kW)-> our ConvTranspose stores
     (kH, kW, I, O) and flips spatially at apply time, matching torch's
     cross-correlation-transpose semantics directly (no flip needed here).
  BatchNorm: weight->scale, bias->bias, running_mean/var->batch_stats.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv_w(t) -> np.ndarray:
    return np.transpose(np.asarray(t), (2, 3, 1, 0))  # OIHW -> HWIO


def _convt_w(t) -> np.ndarray:
    return np.transpose(np.asarray(t), (2, 3, 0, 1))  # IOHW -> HWIO(in,out)


def resnet_stage_params(state_dict: Dict[str, Any], layer: str,
                        num_blocks: int):
    """torchvision ``layerN.*`` tensors -> our ResNetStage param/batch-stat trees."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for b in range(num_blocks):
        pre = f"{layer}.{b}."
        blk: Dict[str, Any] = {
            "conv1": {"kernel": _conv_w(state_dict[pre + "conv1.weight"])},
            "conv2": {"kernel": _conv_w(state_dict[pre + "conv2.weight"])},
        }
        blk_stats: Dict[str, Any] = {}
        for bn, ours in (("bn1", "bn1"), ("bn2", "bn2")):
            blk[ours] = {"BatchNorm_0": {
                "scale": np.asarray(state_dict[pre + bn + ".weight"]),
                "bias": np.asarray(state_dict[pre + bn + ".bias"]),
            }}
            blk_stats[ours] = {"BatchNorm_0": {
                "mean": np.asarray(state_dict[pre + bn + ".running_mean"]),
                "var": np.asarray(state_dict[pre + bn + ".running_var"]),
            }}
        if pre + "downsample.0.weight" in state_dict:
            blk["downsample_conv"] = {
                "kernel": _conv_w(state_dict[pre + "downsample.0.weight"])}
            blk["downsample_bn"] = {"BatchNorm_0": {
                "scale": np.asarray(state_dict[pre + "downsample.1.weight"]),
                "bias": np.asarray(state_dict[pre + "downsample.1.bias"]),
            }}
            blk_stats["downsample_bn"] = {"BatchNorm_0": {
                "mean": np.asarray(state_dict[pre + "downsample.1.running_mean"]),
                "var": np.asarray(state_dict[pre + "downsample.1.running_var"]),
            }}
        params[f"block{b}"] = blk
        stats[f"block{b}"] = blk_stats
    return params, stats


def load_torchvision_resnet(path: str, network: str):
    """Load a torchvision resnet .pth -> (params, batch_stats) for layers 1-3.

    Returns trees keyed conv2/conv3/conv4 matching models.resnet.make_encoder_stages.
    """
    import torch  # cpu torch is available in the image

    from nlspn_eccv20_tpu.models.resnet import STAGE_BLOCKS

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    n1, n2, n3 = STAGE_BLOCKS[network]
    params, stats = {}, {}
    for name, layer, nb in (("conv2", "layer1", n1), ("conv3", "layer2", n2),
                            ("conv4", "layer3", n3)):
        p, s = resnet_stage_params(sd, layer, nb)
        params[name] = p
        stats[name] = s
    return params, stats


def apply_resnet_pretrained(variables: Dict[str, Any], path: str,
                            network: str) -> Dict[str, Any]:
    """Return a copy of `variables` with encoder stages replaced by torchvision weights."""
    import flax

    params, stats = load_torchvision_resnet(path, network)
    v = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") else dict(variables)
    new_params = dict(v["params"])
    new_stats = dict(v.get("batch_stats", {}))
    for k in params:
        assert k in new_params, f"missing stage {k} in model params"
        new_params[k] = params[k]
        new_stats[k] = stats[k]
    return {**v, "params": new_params, "batch_stats": new_stats}
