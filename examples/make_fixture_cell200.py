"""Generate a Cell-200-shaped fixture dataset (synthetic microscopy blobs).

Writes `Cell200_64x64.h5` with the exact keys/layout the real dataset uses
(`CellCounts` + `IMGs_grey` [N,1,H,W] uint8; ref
`CCDM_vanilla/Cell-200/.../main.py:101-146`), so the FULL CLI pipeline —
Cell200 loader, strided label subset, train, per-label sampling, SFID/LS
eval — runs end-to-end without the (download-only) real data. Each image
contains exactly `count` soft blobs, so the label is visually recoverable
and Label Score measures something real.

    python examples/make_fixture_cell200.py --out datasets_fixture \
        --imgs_per_count 15 --max_count 200
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def render_cells(count: int, size: int, rng: np.random.Generator) -> np.ndarray:
    """count soft-edged blobs on a noisy dark background -> [size,size] u8."""
    img = rng.normal(18.0, 6.0, (size, size)).astype(np.float32)
    r = 7  # stamp radius
    yy, xx = np.mgrid[-r:r + 1, -r:r + 1].astype(np.float32)
    for _ in range(count):
        cy, cx = rng.integers(0, size, 2)
        sigma = rng.uniform(1.2, 2.2)
        amp = rng.uniform(120.0, 200.0)
        stamp = amp * np.exp(-(yy**2 + xx**2) / (2 * sigma**2))
        y0, y1 = max(cy - r, 0), min(cy + r + 1, size)
        x0, x1 = max(cx - r, 0), min(cx + r + 1, size)
        img[y0:y1, x0:x1] += stamp[y0 - (cy - r):y1 - (cy - r),
                                   x0 - (cx - r):x1 - (cx - r)]
    return np.clip(img, 0, 255).astype(np.uint8)


def main() -> None:
    import h5py

    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="datasets_fixture")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--imgs_per_count", type=int, default=15)
    p.add_argument("--max_count", type=int, default=200)
    p.add_argument("--seed", type=int, default=2026)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    counts, imgs = [], []
    for c in range(1, args.max_count + 1):
        for _ in range(args.imgs_per_count):
            counts.append(c)
            imgs.append(render_cells(c, args.image_size, rng))
    counts = np.asarray(counts, np.int64)
    imgs = np.stack(imgs)[:, None, :, :]  # [N,1,H,W] like the real h5

    os.makedirs(args.out, exist_ok=True)
    fp = os.path.join(args.out, f"Cell200_{args.image_size}x{args.image_size}.h5")
    with h5py.File(fp, "w") as f:
        f.create_dataset("CellCounts", data=counts)
        f.create_dataset("IMGs_grey", data=imgs, dtype="uint8",
                         compression="gzip", compression_opts=4)
    print(f"wrote {fp}: {len(imgs)} images, counts 1..{args.max_count}")


if __name__ == "__main__":
    main()
