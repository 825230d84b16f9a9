"""Image datasets (compressai/datasets/image.py:38-60), NHWC float32.

``ImageFolder`` expects ``root/train/*`` and ``root/test/*`` split dirs like
the reference; returns numpy [H, W, 3] float32 in [0, 1].
"""

import random
from pathlib import Path

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp")


def load_image(path):
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


def save_image(path, array):
    """array: [H, W, 3] float in [0, 1]."""
    from PIL import Image

    arr = np.clip(np.asarray(array) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


class ImageFolder:
    """root/{split}/ image dataset with optional random-crop transform."""

    def __init__(self, root, transform=None, patch_size=None, split="train"):
        splitdir = Path(root) / split
        if not splitdir.is_dir():
            raise RuntimeError(f'Invalid directory "{splitdir}"')
        self.samples = sorted(
            f for f in splitdir.iterdir()
            if f.suffix.lower() in IMG_EXTENSIONS
        )
        self.transform = transform
        self.patch_size = patch_size

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        img = load_image(self.samples[index])
        if self.patch_size is not None:
            img = random_crop(img, self.patch_size)
        if self.transform is not None:
            img = self.transform(img)
        return img


def random_crop(img, size):
    """Random spatial crop to (size, size); pads by reflection if small."""
    h, w = img.shape[:2]
    if h < size or w < size:
        ph, pw = max(0, size - h), max(0, size - w)
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = img.shape[:2]
    top = random.randint(0, h - size)
    left = random.randint(0, w - size)
    return img[top : top + size, left : left + size]


def center_crop(img, size):
    h, w = img.shape[:2]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return img[top : top + size, left : left + size]
