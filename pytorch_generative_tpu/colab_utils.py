"""Notebook/Colab display helpers (optional; requires matplotlib).

Parity surface: /root/reference/pytorch_generative/colab_utils.py:25-145, with
CUDA-specific helpers mapped to their JAX equivalents.
"""

from __future__ import annotations

import jax
import numpy as np
from matplotlib import animation
from matplotlib import pyplot as plt


def get_device():
    """Returns the first accelerator device (TPU) if available, else CPU."""
    return jax.devices()[0]


def clear_device_memory(delete_live_arrays: bool = False):
    """Frees device memory (the CUDA ``empty_gpu_cache`` equivalent).

    By default this only drops jit compilation caches and internal references
    (safe: live models/optimizer state stay valid), matching the reference's
    semantics of freeing *unreferenced* cached memory. Pass
    ``delete_live_arrays=True`` to also delete every live jax array —
    reclaims all HBM but invalidates any model or array the caller still
    holds (subsequent use raises a deleted-buffer error).
    """
    jax.clear_caches()
    if delete_live_arrays:
        for buf in jax.live_arrays():
            try:
                buf.delete()
            except Exception:  # noqa: BLE001 - best effort.
                pass


def upload_files(destination_dir="."):
    """Interactive file upload (Colab) or a no-op listing locally.

    Parity with the reference's colab-only helper
    (/root/reference/pytorch_generative/colab_utils.py): inside Colab it opens
    the upload widget and writes files into destination_dir; elsewhere it
    returns the files already present (uploads need a browser).
    """
    import os

    try:
        from google.colab import files  # type: ignore

        uploaded = files.upload()
        paths = []
        for name, content in uploaded.items():
            path = os.path.join(destination_dir, name)
            with open(path, "wb") as f:
                f.write(content)
            paths.append(path)
        return paths
    except ImportError:
        return [os.path.join(destination_dir, f)
                for f in os.listdir(destination_dir)]


def load_image(path, grayscale: bool = True):
    """Loads an image file as a float32 array in [0, 1], shape (H, W, C)."""
    img = plt.imread(path).astype(np.float32)
    if img.max() > 1.0:
        img = img / 255.0
    if img.ndim == 2:
        img = img[..., None]
    if grayscale and img.shape[-1] >= 3:
        img = img[..., :3].mean(axis=-1, keepdims=True)
    return img


def imshow(batch, figsize=(12, 12)):
    """Displays an NHWC batch of images as one horizontal strip."""
    batch = np.asarray(batch)
    n, h, w, c = batch.shape
    strip = batch.transpose(1, 0, 2, 3).reshape(h, n * w, c)
    plt.figure(figsize=figsize)
    if c == 1:
        plt.imshow(strip[..., 0], cmap="gray")
    else:
        plt.imshow(strip)
    plt.axis("off")
    plt.show()


def animate(frames, figsize=(12, 12), interval=75):
    """Renders a sequence of NHWC batches as an HTML5 video animation."""
    fig = plt.figure(figsize=figsize)
    plt.axis("off")

    imgs = []
    for batch in frames:
        batch = np.asarray(batch)
        n, h, w, c = batch.shape
        strip = batch.transpose(1, 0, 2, 3).reshape(h, n * w, c)
        if c == 1:
            im = plt.imshow(strip[..., 0], cmap="gray", animated=True)
        else:
            im = plt.imshow(strip, animated=True)
        imgs.append([im])

    anim = animation.ArtistAnimation(
        fig, imgs, interval=interval, blit=True, repeat_delay=1000)
    plt.close(fig)
    return anim.to_html5_video()
