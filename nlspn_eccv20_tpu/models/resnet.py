"""Flax ResNet-18/34 encoder stages (NHWC, BasicBlock).

The NLSPN encoder consumes torchvision's ``layer1..layer3``
(reference /root/reference/src/model/nlspnmodel.py:46-50, common.py:27-42);
we re-implement just those stages natively: BasicBlock = 3x3 conv-BN-ReLU,
3x3 conv-BN, residual add (1x1 conv-BN downsample on stride/channel change),
final ReLU. Conv init is torchvision's kaiming_normal(fan_out).

ImageNet-pretrained weights can be imported from a torchvision state_dict
via ``utils/torch_import.py`` when a .pth is available (the reference's own
``pretrained/*.pth`` files are absent from its release too —
.MISSING_LARGE_BLOBS:3-4).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from nlspn_eccv20_tpu.models.common import BatchNorm, resnet_kernel_init


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = self.dtype or x.dtype
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=resnet_kernel_init,
                    dtype=dtype, param_dtype=jnp.float32, name="conv1")(x)
        y = BatchNorm(use_running_average=not train, dtype=dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    kernel_init=resnet_kernel_init, dtype=dtype,
                    param_dtype=jnp.float32, name="conv2")(y)
        y = BatchNorm(use_running_average=not train, dtype=dtype, name="bn2")(y)

        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=resnet_kernel_init,
                               dtype=dtype, param_dtype=jnp.float32,
                               name="downsample_conv")(x)
            identity = BatchNorm(use_running_average=not train, dtype=dtype,
                                 name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNetStage(nn.Module):
    """One torchvision ``layerN``: a stack of BasicBlocks."""

    features: int
    num_blocks: int
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            x = BasicBlock(self.features, stride=self.stride if i == 0 else 1,
                           dtype=self.dtype, name=f"block{i}")(x, train=train)
        return x


# torchvision resnet18 layers 1-3: (2, 2, 2) blocks; resnet34: (3, 4, 6).
STAGE_BLOCKS = {"resnet18": (2, 2, 2), "resnet34": (3, 4, 6)}


def make_encoder_stages(network: str, dtype=None):
    """Returns (layer1, layer2, layer3) modules: 64->64 s1, ->128 s2, ->256 s2."""
    if network not in STAGE_BLOCKS:
        raise NotImplementedError(f"network {network}")
    n1, n2, n3 = STAGE_BLOCKS[network]
    return (
        ResNetStage(64, n1, stride=1, dtype=dtype, name="conv2"),
        ResNetStage(128, n2, stride=2, dtype=dtype, name="conv3"),
        ResNetStage(256, n3, stride=2, dtype=dtype, name="conv4"),
    )
