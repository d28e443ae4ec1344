"""Sample-grid PNG dumps (torchvision.utils.save_image parity).

The reference saves EMA sample grids every `sample_every` steps
(`CCDM_unified/trainer.py:742-770`); this reproduces the nrow/padding grid
layout with pure numpy + PIL.
"""

from __future__ import annotations

import numpy as np


def make_grid(images01: np.ndarray, nrow: int = 6, padding: int = 1, pad_value: float = 0.0) -> np.ndarray:
    """images01: [N,H,W,C] floats in [0,1] -> [GH,GW,C] grid array in [0,1]."""
    n, h, w, c = images01.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    gh = nrows * (h + padding) + padding
    gw = ncol * (w + padding) + padding
    grid = np.full((gh, gw, c), pad_value, dtype=np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = padding + r * (h + padding)
        x0 = padding + col * (w + padding)
        grid[y0:y0 + h, x0:x0 + w] = images01[i]
    return grid


def save_image_grid(images01: np.ndarray, path: str, nrow: int = 6, padding: int = 1) -> None:
    from PIL import Image

    grid = make_grid(np.asarray(images01, dtype=np.float32), nrow, padding)
    arr = (np.clip(grid, 0.0, 1.0) * 255.0).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def save_gif(frames01: np.ndarray, path: str, nrow: int = 6, padding: int = 1,
             fps: int = 10, stride: int = 1) -> None:
    """Animated GIF of sampling trajectories: frames01 [S,B,H,W,C] in [0,1].

    The reference does this with moviepy (vanilla trainer.py:421-458
    generate_intermediate_gifs); PIL suffices here.
    """
    from PIL import Image

    frames = []
    for s in range(0, len(frames01), stride):
        grid = make_grid(np.asarray(frames01[s], np.float32), nrow, padding)
        arr = (np.clip(grid, 0.0, 1.0) * 255.0).astype(np.uint8)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        frames.append(Image.fromarray(arr))
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)
