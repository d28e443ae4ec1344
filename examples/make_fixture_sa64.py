"""Generate a SteeringAngle-shaped fixture dataset (synthetic road lines).

Writes `SteeringAngle_64x64.h5` with the exact keys/layout the real dataset
uses (`labels` signed degrees + `images` [N,3,H,W] uint8; ref
`CCDM_vanilla/SteeringAngle/SA64/.../main.py:100-135`), so the FULL CLI
pipeline — SteeringAngle loader with SIGNED labels and the shift
normalization `(y+|min|)/max_after_shift`, train, per-label sampling,
SFID/LS eval with `min_label_before_shift` denorm — runs end-to-end without
the (download-only) real data. Each image shows a bright lane line leaving
the bottom center with a horizontal slope proportional to the steering
angle, so the label is visually recoverable and Label Score measures
something real across the whole signed range.

    python examples/make_fixture_sa64.py --out datasets_fixture \
        --imgs_per_angle 50 --num_angles 200
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def render_road(angle: float, size: int, rng: np.random.Generator) -> np.ndarray:
    """Lane line at signed `angle` in [-80, 80] deg -> [3,size,size] u8.

    Slope is linear in the angle (max horizontal travel ~0.72*size at 80 deg)
    so the full signed range stays visually distinguishable — tan() would
    push everything past ~60 deg out of frame within a few rows.
    """
    horizon = rng.integers(14, 22)
    sky = rng.uniform(110, 150)
    ground = rng.uniform(35, 60)
    img = np.empty((size, size, 3), np.float32)
    img[:horizon] = sky + rng.normal(0, 4, (horizon, size, 3))
    img[horizon:] = ground + rng.normal(0, 6, (size - horizon, size, 3))
    # horizon band
    img[horizon - 1:horizon + 1] += rng.uniform(10, 30)

    rows = np.arange(size, dtype=np.float32)
    dy = (size - 1) - rows  # distance above the bottom edge
    slope = (angle / 80.0) * 0.72
    center = (size / 2 - 0.5) + rng.normal(0, 1.0) + slope * dy
    width = rng.uniform(1.6, 2.4)
    amp = rng.uniform(120, 175)
    cols = np.arange(size, dtype=np.float32)
    line = amp * np.exp(-((cols[None, :] - center[:, None]) ** 2)
                        / (2 * width ** 2))
    line[:horizon] = 0.0  # the line exists on the ground plane only
    # slightly warm line color (lane-marking yellow-white)
    img += line[:, :, None] * np.array([1.0, 0.95, 0.75], np.float32)

    # distractor blobs off the line so the eval nets must use the geometry
    for _ in range(rng.integers(1, 4)):
        cy = rng.integers(horizon, size)
        cx = rng.integers(0, size)
        r = rng.uniform(1.5, 3.0)
        a = rng.uniform(20, 50)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        img += (a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r ** 2))
                )[:, :, None]

    return np.clip(img, 0, 255).astype(np.uint8).transpose(2, 0, 1)


def main() -> None:
    import h5py

    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="datasets_fixture")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--imgs_per_angle", type=int, default=50)
    p.add_argument("--num_angles", type=int, default=200)
    p.add_argument("--max_abs_angle", type=float, default=79.6)
    p.add_argument("--seed", type=int, default=2026)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    angles = np.linspace(-args.max_abs_angle, args.max_abs_angle,
                         args.num_angles)
    labels, imgs = [], []
    for a in angles:
        for _ in range(args.imgs_per_angle):
            labels.append(a)
            imgs.append(render_road(float(a), args.image_size, rng))
    labels = np.asarray(labels, np.float64)
    imgs = np.stack(imgs)  # [N,3,H,W] like the real h5

    os.makedirs(args.out, exist_ok=True)
    fp = os.path.join(args.out,
                      f"SteeringAngle_{args.image_size}x{args.image_size}.h5")
    with h5py.File(fp, "w") as f:
        f.create_dataset("labels", data=labels)
        f.create_dataset("images", data=imgs, dtype="uint8",
                         compression="gzip", compression_opts=4)
    print(f"wrote {fp}: {len(imgs)} images, angles "
          f"[{angles[0]:.1f}, {angles[-1]:.1f}] x{args.imgs_per_angle}")


if __name__ == "__main__":
    main()
