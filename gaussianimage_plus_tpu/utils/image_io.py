"""Image IO and logging helpers.

Reference: ``image_path_to_tensor`` / ``save_out_image`` / ``LogWriter``
(utils.py:11-42). Images here are [H, W, C] float32 in [0, 1] (JAX-native
layout) rather than torch's [1, C, H, W].
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
from PIL import Image


def load_image(path) -> np.ndarray:
    """PNG/JPEG -> [H, W, 3] float32 in [0, 1] (utils.py:21-27)."""
    img = Image.open(path)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    return arr[:, :, :3]


def save_image(arr, path) -> None:
    """[H, W, 3] float in [0,1] -> PNG (utils.py:11-18)."""
    arr = np.asarray(arr)
    u8 = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    Image.fromarray(u8).save(str(path))


class LogWriter:
    """print + append to train.txt (utils.py:32-42)."""

    def __init__(self, file_path, train: bool = True):
        os.makedirs(file_path, exist_ok=True)
        self.file_path = os.path.join(file_path, "train.txt" if train else "test.txt")

    def write(self, text: str) -> None:
        print(text)
        with open(self.file_path, "a") as f:
            f.write(text + "\n")
