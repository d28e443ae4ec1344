"""Multi-dimensional label dataset (Sliced-CCDM's power_vector, U3 parity).

TPU-native re-design of `CCDM_unified/dataset.py:13-253`:
- `PowerTransformer`: QuantileTransformer wrapper normalizing power values
  by max_power=240000, with the normal-output min-max rescale to [0,1] and
  the exact inverse path (`dataset.py:36-74`).
- `PowerSeqDataset`: grayscale tiff design images + CSV power-vector labels
  (one row per design, header skipped), exposing the reference's
  `load_train_data` / `load_evaluation_data` / `fn_normalize_labels`
  interface; images come back NHWC uint8 like every other loader here (the
  reference keeps [-1,1] tensors — our trainers normalize on device).
- `make_synthetic_power`: a synthetic multi-dim stand-in (the real dataset
  is private) so the sliced-vicinal path is exercisable end to end.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ccdm_tpu.data.datasets import DatasetBundle


class PowerTransformer:
    """Quantile-normalizing label transformer (`dataset.py:13-90`)."""

    def __init__(self, n_quantiles: int = 1000, output_distribution: str = "normal"):
        from sklearn.preprocessing import QuantileTransformer

        self.qt = QuantileTransformer(
            n_quantiles=n_quantiles, output_distribution=output_distribution,
            random_state=42,
        )
        self.max_power = 240000.0
        self.output_distribution = output_distribution

    def fit(self, power_sequences: np.ndarray) -> "PowerTransformer":
        self.qt.fit(power_sequences.reshape(-1, 1) / self.max_power)
        return self

    def transform(self, power_sequences: np.ndarray) -> np.ndarray:
        shape = power_sequences.shape
        t = self.qt.transform(power_sequences.reshape(-1, 1) / self.max_power)
        if self.output_distribution == "normal":
            t = (t - t.min()) / (t.max() - t.min())
        return t.reshape(shape)

    def inverse_transform(self, transformed: np.ndarray) -> np.ndarray:
        shape = transformed.shape
        v = transformed.reshape(-1, 1)
        if self.output_distribution == "normal":
            lo = self.qt.transform(np.array([[0.0]]))
            hi = self.qt.transform(np.array([[1.0]]))
            v = v * (hi - lo) + lo
        return self.qt.inverse_transform(v).reshape(shape) * self.max_power

    def save(self, filepath: str) -> None:
        import joblib

        joblib.dump({"transformer": self.qt, "max_power": self.max_power,
                     "output_distribution": self.output_distribution}, filepath)

    @classmethod
    def load(cls, filepath: str) -> "PowerTransformer":
        import joblib

        d = joblib.load(filepath)
        obj = cls(output_distribution=d["output_distribution"])
        obj.qt = d["transformer"]
        obj.max_power = d["max_power"]
        return obj


def load_power_vector(
    design_folder: str,
    power_path: str,
    power_transformer: Optional[PowerTransformer] = None,
) -> DatasetBundle:
    """tiff designs + CSV power vectors -> DatasetBundle (`dataset.py:93-206`)."""
    from PIL import Image

    power_data = np.loadtxt(power_path, delimiter=",", skiprows=1)
    if power_data.ndim == 1:
        power_data = power_data[:, None]
    designs = sorted(
        (f for f in os.listdir(design_folder) if f.endswith(".tiff")),
        key=lambda x: int(x.split(".")[0]),
    )
    if len(designs) != len(power_data):
        raise ValueError(
            f"design files ({len(designs)}) != power sequences ({len(power_data)})"
        )
    images = np.stack([
        np.asarray(Image.open(os.path.join(design_folder, f)).convert("L"), np.uint8)
        for f in designs
    ])[..., None]  # [N,H,W,1]

    max_power = float(power_data.max())
    if power_transformer is not None:
        labels_norm = power_transformer.transform(power_data)
        fn_norm = power_transformer.transform
        fn_denorm = power_transformer.inverse_transform
    else:
        labels_norm = power_data / max_power
        fn_norm = lambda y: np.asarray(y, float) / max_power
        fn_denorm = lambda y: np.asarray(y, float) * max_power

    return DatasetBundle(
        "power_vector", images, power_data, labels_norm.astype(np.float64),
        fn_norm, fn_denorm,
        eval_images=images, eval_labels_raw=power_data,
    )


def make_synthetic_power(n: int = 256, image_size: int = 64, label_dim: int = 8,
                         seed: int = 0) -> DatasetBundle:
    """Synthetic multi-dim-label set exercising the sliced-vicinal path."""
    rng = np.random.default_rng(seed)
    labels = rng.uniform(0.05, 0.95, (n, label_dim))
    # images encode the first two label dims as vertical/horizontal gradients
    ys = np.linspace(0, 1, image_size)
    imgs = np.clip(
        labels[:, 0, None, None, None] * 200 * ys[None, :, None, None]
        + labels[:, 1, None, None, None] * 200 * ys[None, None, :, None]
        + rng.normal(0, 10, (n, image_size, image_size, 1)),
        0, 255,
    ).astype(np.uint8)
    fn_id = lambda y: np.asarray(y, float)
    return DatasetBundle("power_vector", imgs, labels, labels, fn_id, fn_id)
