"""Host-side image/depth transforms (PIL + NumPy, no torch).

Re-implements the torchvision transform semantics the reference relies on
(/root/reference/src/data/nyu.py:101-156, kittidc.py:128-255): resize,
rotate, center/random crop, horizontal flip, color jitter, ImageNet
normalization. Depth maps always use NEAREST rotation and the reference's
interpolation choices (bilinear resize on NYU, nearest on KITTI).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image, ImageEnhance

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

RESAMPLE = {
    "nearest": Image.NEAREST,
    "bilinear": Image.BILINEAR,
    "bicubic": Image.BICUBIC,
}


def to_pil_rgb(arr: np.ndarray) -> Image.Image:
    return Image.fromarray(arr.astype(np.uint8), mode="RGB")


def to_pil_depth(arr: np.ndarray) -> Image.Image:
    return Image.fromarray(arr.astype(np.float32), mode="F")


def resize_short_side(img: Image.Image, target: int, method: str) -> Image.Image:
    """torchvision T.Resize(int): scale the SHORT side to `target`."""
    w, h = img.size
    if h <= w:
        nh, nw = target, max(1, int(round(target * w / h)))
    else:
        nw, nh = target, max(1, int(round(target * h / w)))
    return img.resize((nw, nh), RESAMPLE[method])


def rotate(img: Image.Image, degrees: float, method: str) -> Image.Image:
    """torchvision TF.rotate: CCW rotation about the center, same size."""
    return img.rotate(degrees, resample=RESAMPLE[method])


def center_crop(img: Image.Image, crop_hw: Tuple[int, int]) -> Image.Image:
    ch, cw = crop_hw
    w, h = img.size
    top = int(round((h - ch) / 2.0))
    left = int(round((w - cw) / 2.0))
    return img.crop((left, top, left + cw, top + ch))


def crop(img: Image.Image, top: int, left: int, height: int, width: int) -> Image.Image:
    return img.crop((left, top, left + width, top + height))


def hflip(img: Image.Image) -> Image.Image:
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def adjust_brightness(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Brightness(img).enhance(factor)


def adjust_contrast(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Contrast(img).enhance(factor)


def adjust_saturation(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Color(img).enhance(factor)


def color_jitter(img: Image.Image, rng: np.random.Generator,
                 brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4) -> Image.Image:
    """torchvision ColorJitter: random factors, random application order."""
    ops = []
    fb = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
    fc = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
    fs = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
    ops = [(0, fb), (1, fc), (2, fs)]
    order = rng.permutation(3)
    fns = [adjust_brightness, adjust_contrast, adjust_saturation]
    for i in order:
        kind, f = ops[i]
        img = fns[kind](img, f)
    return img


def rgb_to_normalized(img: Image.Image) -> np.ndarray:
    """PIL RGB -> float32 (H, W, 3), /255 then ImageNet-normalized."""
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def depth_to_array(img: Image.Image) -> np.ndarray:
    """PIL 'F' depth -> float32 (H, W, 1)."""
    return np.asarray(img, np.float32)[..., None]
