"""Import torchvision ResNet / reference NLSPN checkpoints into our params.

The reference loads ImageNet-pretrained resnet18/34 state_dicts from local
``pretrained/*.pth`` files (/root/reference/src/model/common.py:21-42) and
its released model checkpoints are torch ``{net: state_dict, args}`` saves
(main.py:263-275). This module maps those tensors into the Flax parameter
tree so released weights remain usable.

Weight layout conversions:
  torch Conv2d weight (O, I, kH, kW)         -> HWIO (kH, kW, I, O)
  torch ConvTranspose2d weight (I, O, kH, kW)-> our ConvTranspose stores
     (kH, kW, I, O) PRE-FLIPPED spatially (lhs-dilated-conv convention;
     see models/common.py ConvTranspose), so the import flips here.
  BatchNorm: weight->scale, bias->bias, running_mean/var->batch_stats.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv_w(t) -> np.ndarray:
    return np.transpose(np.asarray(t), (2, 3, 1, 0))  # OIHW -> HWIO


def _convt_w(t) -> np.ndarray:
    # IOHW -> HWIO(in,out), pre-flipped spatially (our ConvTranspose stores
    # the lhs-dilated-conv kernel; torch's transpose semantics need the flip).
    return np.flip(np.transpose(np.asarray(t), (2, 3, 0, 1)), axis=(0, 1)).copy()


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


# ---------------------------------------------------------------------------
# Full reference-checkpoint import: every tensor of the reference NLSPNModel
# state_dict (/root/reference/src/model/nlspnmodel.py:23-157) mapped into our
# Flax variable tree, including the fused-heads re-assembly (models/nlspn.py
# Heads docstring) and the GRU sub-nets under the shared ``prop_step`` scope.
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    return np.asarray(t, dtype=np.float32)


def import_nlspn_state_dict(variables: Dict[str, Any],
                            state_dict: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Map a reference NLSPN torch state_dict onto our variable tree.

    `state_dict` values may be torch tensors or numpy arrays. Returns a new
    `{params, batch_stats}` dict shaped exactly like `variables` (our model
    must have been init'ed with the same cfg). The reference's frozen dummy
    gather weights (``w``, ``b``, ``w_conf``, nlspnmodel.py:107-114) have no
    counterpart here — the propagation op needs no weights — and are skipped.
    """
    import flax

    sd = {k: _np(v) for k, v in state_dict.items()
          if k not in ("w", "b", "w_conf") and not k.startswith("param_groups")}

    v = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") else dict(variables)
    params = _deepcopy_tree(v["params"])
    stats = _deepcopy_tree(v.get("batch_stats", {}))

    def conv_bnfree(dst: Dict[str, Any], pre: str):
        """reference conv_bn_relu(bn=False): Sequential[0]=Conv2d."""
        dst["kernel"] = _conv_w(sd[pre + "0.weight"])
        dst["bias"] = _np(sd[pre + "0.bias"])

    def conv_bn(pdst: Dict[str, Any], sdst: Dict[str, Any], pre: str,
                transposed: bool = False):
        """reference conv(t)_bn_relu(bn=True): [0]=conv (no bias), [1]=BN."""
        w = sd[pre + "0.weight"]
        pdst["conv"]["kernel"] = _convt_w(w) if transposed else _conv_w(w)
        bn = pdst["bn"]["BatchNorm_0"]
        bn["scale"] = _np(sd[pre + "1.weight"])
        bn["bias"] = _np(sd[pre + "1.bias"])
        st = sdst["bn"]["BatchNorm_0"]
        st["mean"] = _np(sd[pre + "1.running_mean"])
        st["var"] = _np(sd[pre + "1.running_var"])

    # Encoder stem.
    conv_bnfree(params["conv1_rgb"]["conv"], "conv1_rgb.")
    if cfg.use_S2D:
        s2d = params["S2D"]
        s2d["pool_conv0_kernel"] = _conv_w(sd["S2D.pool_convs.0.0.weight"])
        s2d["pool_conv0_bias"] = _np(sd["S2D.pool_convs.0.0.bias"])
        s2d["pool_conv1_kernel"] = _conv_w(sd["S2D.pool_convs.1.0.weight"])
        s2d["pool_conv1_bias"] = _np(sd["S2D.pool_convs.1.0.bias"])
        conv_bnfree(s2d["conv"]["conv"], "S2D.conv.")
    else:
        conv_bnfree(params["conv1_dep"]["conv"], "conv1_dep.")

    # ResNet stages: the reference stores torchvision layer1-3 as conv2-4.
    from nlspn_eccv20_tpu.models.resnet import STAGE_BLOCKS

    for stage, nb in zip(("conv2", "conv3", "conv4"), STAGE_BLOCKS[cfg.network]):
        p, s = resnet_stage_params(sd, stage, nb)
        params[stage] = p
        stats[stage] = s

    conv_bn(params["conv5"], stats["conv5"], "conv5.")
    for dec in ("dec4", "dec3", "dec2"):
        conv_bn(params[dec], stats[dec], dec + ".", transposed=True)

    # Heads — fused stage-1 conv/BN are channel-concats of the per-head ones
    # (id, off_aff[, cf] order; see models/nlspn.py Heads).
    heads = ["id", "off_aff"] + (["cf"] if cfg.conf_prop else [])
    hp, hs = params["heads"], stats["heads"]
    hp["dec1_conv"]["kernel"] = np.concatenate(
        [_conv_w(sd[f"{h}_dec1.0.weight"]) for h in heads], axis=-1)
    bn = hp["dec1_bn"]["BatchNorm_0"]
    bn["scale"] = np.concatenate([_np(sd[f"{h}_dec1.1.weight"]) for h in heads])
    bn["bias"] = np.concatenate([_np(sd[f"{h}_dec1.1.bias"]) for h in heads])
    st = hs["dec1_bn"]["BatchNorm_0"]
    st["mean"] = np.concatenate(
        [_np(sd[f"{h}_dec1.1.running_mean"]) for h in heads])
    st["var"] = np.concatenate(
        [_np(sd[f"{h}_dec1.1.running_var"]) for h in heads])
    for h in heads:
        hp[f"{h}_dec0_kernel"] = _conv_w(sd[f"{h}_dec0.0.weight"])
        hp[f"{h}_dec0_bias"] = _np(sd[f"{h}_dec0.0.bias"])

    params["aff_scale_const"] = _np(sd["aff_scale_const"]).reshape(1)

    if cfg.use_GRU:
        ea = params["encode_aff"]
        for i in range(3):
            conv_bnfree(ea[f"conv{i}"]["conv"], f"encode_aff.{i}.")
        ps = params["prop_step"]
        for i in range(3):
            conv_bnfree(ps["encode_dep"][f"conv{i}"]["conv"],
                        f"encode_dep.{i}.")
        for i in range(3):
            da = ps["decode_aff"][f"deconv{i}"]["conv"]
            da["kernel"] = _convt_w(sd[f"decode_aff.{i}.0.weight"])
            da["bias"] = _np(sd[f"decode_aff.{i}.0.bias"])
        for gate in ("convz", "convr"):
            ps["GRU"][f"{gate}_kernel"] = _conv_w(sd[f"GRU.{gate}.weight"])
            ps["GRU"][f"{gate}_bias"] = _np(sd[f"GRU.{gate}.bias"])
        ps["GRU"]["convq"]["kernel"] = _conv_w(sd["GRU.convq.weight"])
        ps["GRU"]["convq"]["bias"] = _np(sd["GRU.convq.bias"])

    out = {**v, "params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _deepcopy_tree(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _deepcopy_tree(x) for k, x in tree.items()}
    return np.array(tree)


def load_nlspn_torch_checkpoint(variables: Dict[str, Any], path: str,
                                cfg) -> Dict[str, Any]:
    """Load a reference training checkpoint ``{net: state_dict, args}``
    (main.py:263-275) or a bare state_dict and import it."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["net"] if isinstance(ckpt, dict) and "net" in ckpt else ckpt
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in sd.items()}
    return import_nlspn_state_dict(variables, sd, cfg)
