"""Dataset pipeline tests against synthetic h5/tiff fixtures with the
reference's exact key names and filter semantics."""

import os

import numpy as np
import pytest

from ccdm_tpu.data import load_dataset, make_synthetic
from ccdm_tpu.data.datasets import (
    load_cell200,
    load_rc49,
    load_steeringangle,
    load_utkface,
)
from ccdm_tpu.data.power import PowerTransformer, load_power_vector, make_synthetic_power


@pytest.fixture()
def h5dir(tmp_path, rng):
    import h5py

    d = str(tmp_path)
    # RC-49: keys labels/images/indx_train, NCHW uint8
    n = 60
    labels = rng.uniform(0.5, 89.5, n)
    images = rng.integers(0, 255, (n, 3, 8, 8), dtype=np.uint8)
    with h5py.File(os.path.join(d, "RC-49_8x8.h5"), "w") as f:
        f.create_dataset("labels", data=labels)
        f.create_dataset("images", data=images)
        f.create_dataset("indx_train", data=np.arange(0, n, 2))
    # UTKFace: integer ages
    ages = rng.integers(1, 61, n).astype(float)
    with h5py.File(os.path.join(d, "UTKFace_8x8.h5"), "w") as f:
        f.create_dataset("labels", data=ages)
        f.create_dataset("images", data=images)
    # SteeringAngle: signed labels
    angles = rng.uniform(-79, 79, n)
    with h5py.File(os.path.join(d, "SteeringAngle_8x8.h5"), "w") as f:
        f.create_dataset("labels", data=angles)
        f.create_dataset("images", data=images)
    # Cell-200: CellCounts/IMGs_grey, grayscale [N,1,H,W]
    counts = rng.integers(1, 201, n).astype(float)
    grey = rng.integers(0, 255, (n, 1, 8, 8), dtype=np.uint8)
    with h5py.File(os.path.join(d, "Cell200_8x8.h5"), "w") as f:
        f.create_dataset("CellCounts", data=counts)
        f.create_dataset("IMGs_grey", data=grey)
    return d, labels, ages, angles, counts


def test_rc49_pipeline(h5dir):
    d, labels, *_ = h5dir
    b = load_rc49(d, image_size=8, min_label=0, max_label=90,
                  max_num_img_per_label=2, data_split="train")
    assert b.images.shape[-1] == 3  # NHWC
    assert b.labels_norm.min() >= 0 and b.labels_norm.max() <= 1
    # train split only
    assert len(b.images) <= 30
    # normalization roundtrip
    np.testing.assert_allclose(b.fn_denormalize(b.fn_normalize(labels[:5])), labels[:5])
    # eval set is the full filtered set
    assert len(b.eval_images) >= len(b.images)


def test_rc49_label_filter(h5dir):
    d, *_ = h5dir
    b = load_rc49(d, image_size=8, min_label=30, max_label=60, data_split="all")
    assert np.all((b.labels_raw > 30) & (b.labels_raw < 60))


def test_utkface_replication(h5dir):
    d, _, ages, *_ = h5dir
    b = load_utkface(d, image_size=8, min_label=1, max_label=60,
                     num_img_per_label_after_replica=3)
    # every present age must now have >= 3 images (replicated minorities)
    for lab in np.unique(b.labels_raw):
        assert (b.labels_raw == lab).sum() >= 3


def test_steeringangle_shift_normalization(h5dir):
    d, _, _, angles, _ = h5dir
    b = load_steeringangle(d, image_size=8)
    assert b.labels_norm.min() >= 0 and b.labels_norm.max() <= 1
    # shift normalization: denorm recovers signed values
    np.testing.assert_allclose(
        b.fn_denormalize(b.labels_norm), b.labels_raw, atol=1e-9
    )
    assert b.labels_raw.min() < 0  # signed labels preserved


def test_cell200_stride_and_subset(h5dir):
    d, *_ , counts = h5dir
    b = load_cell200(d, image_size=8, min_label=1, max_label=200,
                     stepsize=2, num_imgs_per_label=1)
    assert b.channels == 1
    # strided labels only (odd counts 1,3,5,... given stepsize 2 from 1)
    assert all(int(l) % 2 == 1 for l in b.labels_raw)
    # at most one image per label
    _, c = np.unique(b.labels_raw, return_counts=True)
    assert c.max() <= 1


def test_dispatcher(h5dir):
    d, *_ = h5dir
    b = load_dataset("RC-49", d, image_size=8)
    assert b.name == "RC-49"
    with pytest.raises(ValueError):
        load_dataset("nope", d)


def test_power_vector_tiff_pipeline(tmp_path, rng):
    from PIL import Image

    d = tmp_path / "designs"
    d.mkdir()
    n, size, dim = 12, 8, 5
    for i in range(n):
        arr = rng.integers(0, 255, (size, size), dtype=np.uint8)
        Image.fromarray(arr, mode="L").save(str(d / f"{i}.tiff"))
    power = rng.uniform(0, 240000, (n, dim))
    csv = tmp_path / "power.csv"
    header = ",".join(f"p{i}" for i in range(dim))
    np.savetxt(str(csv), power, delimiter=",", header=header, comments="")

    pt = PowerTransformer().fit(power)
    b = load_power_vector(str(d), str(csv), power_transformer=pt)
    assert b.images.shape == (n, size, size, 1)
    assert b.label_dim == dim
    assert b.labels_norm.min() >= 0 and b.labels_norm.max() <= 1

    # without transformer: max-power normalization
    b2 = load_power_vector(str(d), str(csv))
    np.testing.assert_allclose(b2.labels_norm, power / power.max())


def test_power_count_mismatch_raises(tmp_path, rng):
    from PIL import Image

    d = tmp_path / "designs"
    d.mkdir()
    Image.fromarray(np.zeros((4, 4), np.uint8), mode="L").save(str(d / "0.tiff"))
    csv = tmp_path / "power.csv"
    np.savetxt(str(csv), rng.uniform(0, 1, (3, 2)), delimiter=",", header="a,b", comments="")
    with pytest.raises(ValueError):
        load_power_vector(str(d), str(csv))


def test_synthetic_power_bundle():
    b = make_synthetic_power(n=32, image_size=16, label_dim=4)
    assert b.images.shape == (32, 16, 16, 1)
    assert b.label_dim == 4
