"""Host-side image/video helpers for the examples.

Capability match for /root/reference/utils/utils.py:22-38 and the
example-level preprocessing (example_img_classify.py:20-25,56-60;
example_multimodal.py:18-50).  Pure NumPy/PIL; device transfer happens at the
example level via jnp.asarray.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

IMAGENET_MEAN_RGB = (0.485 * 255, 0.456 * 255, 0.406 * 255)
IMAGENET_STDDEV_RGB = (0.229 * 255, 0.224 * 255, 0.225 * 255)


def load_image(path: str) -> np.ndarray:
    """Load an image as [1, C, H, W] float32 in [0, 255]."""
    from PIL import Image

    img = np.asarray(Image.open(path), np.uint8)
    return np.transpose(img, (2, 0, 1)).astype(np.float32)[None]


def center_crop_resize(img: np.ndarray, size: Sequence[int]) -> np.ndarray:
    """Crop [B, C, H, W] to a centred square, then bilinear-resize to size."""
    from PIL import Image

    _, _, h, w = img.shape
    min_size = min(h, w)
    top = int(h / 2 - min_size / 2)
    left = int(w / 2 - min_size / 2)
    cropped = img[:, :, top : top + min_size, left : left + min_size]

    out = np.empty((img.shape[0], img.shape[1], size[0], size[1]), np.float32)
    for b in range(img.shape[0]):
        hwc = np.transpose(cropped[b], (1, 2, 0))
        pil = Image.fromarray(hwc.astype(np.uint8))
        resized = pil.resize((size[1], size[0]), Image.BILINEAR)
        out[b] = np.transpose(np.asarray(resized, np.float32), (2, 0, 1))
    return out


def normalize_imagenet(img: np.ndarray) -> np.ndarray:
    """Standard ImageNet mean/std normalisation on [B, C, H, W] in [0, 255]."""
    mean = np.asarray(IMAGENET_MEAN_RGB, np.float32)[None, :, None, None]
    std = np.asarray(IMAGENET_STDDEV_RGB, np.float32)[None, :, None, None]
    return (img - mean) / std


def crop_center_square(frame: np.ndarray) -> np.ndarray:
    """Crop a [H, W, C] frame to its centred square."""
    y, x = frame.shape[0:2]
    min_dim = min(y, x)
    start_x = (x // 2) - (min_dim // 2)
    start_y = (y // 2) - (min_dim // 2)
    return frame[start_y : start_y + min_dim, start_x : start_x + min_dim]


def load_video(
    path: str, max_frames: int = 0, resize: Tuple[int, int] = (224, 224)
) -> np.ndarray:
    """Load a video as [T, H, W, 3] float32 in [0, 1] (requires cv2)."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    try:
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            frame = crop_center_square(frame)
            frame = cv2.resize(frame, resize)
            frame = frame[:, :, [2, 1, 0]]  # BGR -> RGB
            frames.append(frame)
            if len(frames) == max_frames:
                break
    finally:
        cap.release()
    return np.asarray(frames, np.float32) / 255.0


def save_video(path: str, data: np.ndarray, fps: int = 25) -> None:
    """Save [T, H, W, 3] float in [0, 1] as an MJPG avi (requires cv2)."""
    import cv2

    fourcc = cv2.VideoWriter_fourcc("M", "J", "P", "G")
    out = cv2.VideoWriter(path, fourcc, fps, (data.shape[2], data.shape[1]))
    for frame in data:
        out.write((frame[:, :, ::-1] * 255).astype(np.uint8))
    out.release()


def dump_pickle(obj, file_path: str) -> None:
    import pickle

    with open(file_path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(file_path: str):
    import pickle

    with open(file_path, "rb") as f:
        return pickle.load(f)


def show_animation(images: np.ndarray, fps: int = 25, title: str = "animation"):
    """Display [T, H, W, C] frames as a matplotlib animation (interactive)."""
    import matplotlib.pyplot as plt
    from matplotlib.animation import ArtistAnimation

    interval = 1000 / fps
    fig = plt.figure(title)
    frames = [[plt.imshow(images[i], animated=True)] for i in range(images.shape[0])]
    ani = ArtistAnimation(
        fig, frames, interval=interval, blit=True, repeat_delay=1000
    )
    plt.show()
    return ani


def resolve_sample_path(path: str, fallback_root: str = "/root/reference") -> str:
    """Example-media fallback: return ``path`` if it exists, else the same
    relative path under the reference repo's checkout (the examples ship
    against the reference's ``sample_data/``)."""
    import os

    if os.path.exists(path):
        return path
    alt = os.path.join(fallback_root, path.lstrip("./"))
    return alt if os.path.exists(alt) else path
