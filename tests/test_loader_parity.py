"""Loader parity vs the reference's OWN pipeline logic (VERDICT missing-3).

Each oracle below is a line-faithful numpy transcription of the vanilla
tree's dataset block, executed on the same fixture h5 content as our
loaders:

- RC-49:          CCDM_vanilla/RC-49/RC-49_64x64/CCGM/CCDM/main.py:113-159
- UTKFace:        CCDM_vanilla/UTKFace/UK64/CCGM/CCDM/main.py:108-172
- SteeringAngle:  CCDM_vanilla/SteeringAngle/SA64/CCGM/CCDM/main.py:86-148
- Cell-200:       CCDM_vanilla/Cell-200/Cell-200_64x64/CCGM/CCDM/main.py:101-146

Comparison semantics: the reference reorders data into sorted-label groups
and (when the per-label cap binds) subsamples via the GLOBAL numpy RNG, so
byte-exact array order / subsample identity across RNG engines is not the
contract. What IS asserted:
- the selected (label, image) MULTISET is identical whenever selection is
  deterministic (caps non-binding; Cell-200 first-N; filters; splits);
- per-label COUNTS are identical whenever a seeded shuffle/choice is
  involved (caps binding, UTKFace replication);
- normalization functions agree elementwise.
"""

import hashlib
import os

import numpy as np
import pytest

from ccdm_tpu.data.datasets import (
    load_cell200,
    load_rc49,
    load_steeringangle,
    load_utkface,
)


# --------------------------------------------------------------- helpers

def _digest(img: np.ndarray) -> str:
    return hashlib.md5(np.ascontiguousarray(img).tobytes()).hexdigest()


def canonical(images: np.ndarray, labels: np.ndarray):
    """Order-independent canonical form: (label, image-digest) pairs sorted."""
    pairs = sorted((float(l), _digest(im)) for l, im in zip(labels, images))
    return pairs


def label_counts(labels: np.ndarray) -> dict:
    u, c = np.unique(labels, return_counts=True)
    return {float(k): int(v) for k, v in zip(u, c)}


def _to_nhwc(x):
    if x.ndim == 3:
        return x[..., None]
    if x.ndim == 4 and x.shape[1] in (1, 3) and x.shape[1] != x.shape[-1]:
        return np.transpose(x, (0, 2, 3, 1))
    return x


# --------------------------------------------------------------- oracles

def ref_rc49(images_all, labels_all, indx_train, q1, q2, cap,
             data_split="train", seed=2023):
    """Transcription of RC-49 main.py:113-159."""
    np.random.seed(seed)
    if data_split == "train":
        images = images_all[indx_train]
        labels = labels_all[indx_train].astype(float)
    else:
        images = images_all.copy()
        labels = labels_all.astype(float).copy()
    indx = np.where((labels > q1) * (labels < q2) == True)[0]  # noqa: E712
    labels, images = labels[indx], images[indx]
    unique_labels_tmp = np.sort(np.array(list(set(labels))))
    sel_indx = None
    for i in range(len(unique_labels_tmp)):
        indx_i = np.where(labels == unique_labels_tmp[i])[0]
        if len(indx_i) > cap:
            np.random.shuffle(indx_i)
            indx_i = indx_i[0:cap]
        sel_indx = indx_i if sel_indx is None else np.concatenate((sel_indx, indx_i))
    return images[sel_indx], labels[sel_indx]


def ref_utkface(images, labels, min_label, max_label, cap, replica, seed=2023):
    """Transcription of UTKFace main.py:108-172 (subset -> cap -> replicate)."""
    np.random.seed(seed)
    labels = labels.astype(float)
    selected_labels = np.arange(min_label, max_label + 1)
    images_subset = labels_subset = None
    for i in range(len(selected_labels)):
        idx = np.where(labels == selected_labels[i])[0]
        if images_subset is None:
            images_subset, labels_subset = images[idx], labels[idx]
        else:
            images_subset = np.concatenate((images_subset, images[idx]), axis=0)
            labels_subset = np.concatenate((labels_subset, labels[idx]))
    images, labels = images_subset, labels_subset

    unique_labels_tmp = np.sort(np.array(list(set(labels))))
    sel_indx = None
    for i in range(len(unique_labels_tmp)):
        indx_i = np.where(labels == unique_labels_tmp[i])[0]
        if len(indx_i) > cap:
            np.random.shuffle(indx_i)
            indx_i = indx_i[0:cap]
        sel_indx = indx_i if sel_indx is None else np.concatenate((sel_indx, indx_i))
    images, labels = images[sel_indx], labels[sel_indx]

    replica_cap = np.min([replica, cap])
    if replica_cap > 1:
        unique_labels_replica = np.sort(np.array(list(set(labels))))
        images_replica = labels_replica = None
        for curr_label in unique_labels_replica:
            indx_i = np.where(labels == curr_label)[0]
            if len(indx_i) < replica_cap:
                indx_rep = np.random.choice(indx_i, size=replica_cap - len(indx_i),
                                            replace=True)
                if images_replica is None:
                    images_replica, labels_replica = images[indx_rep], labels[indx_rep]
                else:
                    images_replica = np.concatenate((images_replica, images[indx_rep]), axis=0)
                    labels_replica = np.concatenate((labels_replica, labels[indx_rep]))
        if images_replica is not None:
            images = np.concatenate((images, images_replica), axis=0)
            labels = np.concatenate((labels, labels_replica))
    return images, labels


def ref_steeringangle(images, labels, q1, q2, cap, seed=2023):
    """Transcription of SA main.py:86-148 incl. the shift normalization."""
    np.random.seed(seed)
    labels = labels.astype(float)
    indx = np.where((labels > q1) * (labels < q2) == True)[0]  # noqa: E712
    labels, images = labels[indx], images[indx]
    min_label_before_shift = np.min(labels)
    max_label_after_shift = np.max(labels + np.abs(min_label_before_shift))

    def fn_norm_labels(inp):
        return (inp + np.abs(min_label_before_shift)) / max_label_after_shift

    unique_labels_tmp = np.sort(np.array(list(set(labels))))
    sel_indx = None
    for i in range(len(unique_labels_tmp)):
        indx_i = np.where(labels == unique_labels_tmp[i])[0]
        if len(indx_i) > cap:
            np.random.shuffle(indx_i)
            indx_i = indx_i[0:cap]
        sel_indx = indx_i if sel_indx is None else np.concatenate((sel_indx, indx_i))
    return images[sel_indx], labels[sel_indx], fn_norm_labels


def ref_cell200(images, labels, min_label, max_label, stepsize, num_imgs_per_label):
    """Transcription of Cell-200 main.py:101-146 (subset -> strided first-N)."""
    labels = labels.astype(float)
    selected_labels = np.arange(min_label, max_label + 1)
    images_subset = labels_subset = None
    for i in range(len(selected_labels)):
        idx = np.where(labels == selected_labels[i])[0]
        if images_subset is None:
            images_subset, labels_subset = images[idx], labels[idx]
        else:
            images_subset = np.concatenate((images_subset, images[idx]), axis=0)
            labels_subset = np.concatenate((labels_subset, labels[idx]))
    images, labels = images_subset, labels_subset

    selected_labels = np.arange(min_label, max_label + 1, stepsize)
    images_out = labels_out = None
    for i in range(len(selected_labels)):
        idx = np.where(labels == selected_labels[i])[0]
        if images_out is None:
            images_out = images[idx[0:num_imgs_per_label]]
            labels_out = labels[idx[0:num_imgs_per_label]]
        else:
            images_out = np.concatenate((images_out, images[idx[0:num_imgs_per_label]]), axis=0)
            labels_out = np.concatenate((labels_out, labels[idx[0:num_imgs_per_label]]))
    return images_out, labels_out


# --------------------------------------------------------------- fixtures

@pytest.fixture()
def h5dir(tmp_path):
    import h5py

    rng = np.random.default_rng(7)
    d = str(tmp_path)
    n = 80
    # RC-49-like: float labels, repeated so per-label groups have 2-6 members
    yaws = np.repeat(np.round(np.linspace(2.0, 88.0, 20), 1), 4)
    rng.shuffle(yaws)
    images = rng.integers(0, 255, (n, 3, 8, 8), dtype=np.uint8)
    with h5py.File(os.path.join(d, "RC-49_8x8.h5"), "w") as f:
        f.create_dataset("labels", data=yaws)
        f.create_dataset("images", data=images)
        f.create_dataset("indx_train", data=np.sort(rng.permutation(n)[:56]))
    ages = rng.integers(1, 21, n).astype(float)
    with h5py.File(os.path.join(d, "UTKFace_8x8.h5"), "w") as f:
        f.create_dataset("labels", data=ages)
        f.create_dataset("images", data=images)
    angles = np.repeat(np.round(np.linspace(-70, 70, 20), 2), 4)
    rng.shuffle(angles)
    with h5py.File(os.path.join(d, "SteeringAngle_8x8.h5"), "w") as f:
        f.create_dataset("labels", data=angles)
        f.create_dataset("images", data=images)
    counts = rng.integers(1, 41, n).astype(float)
    grey = rng.integers(0, 255, (n, 1, 8, 8), dtype=np.uint8)
    with h5py.File(os.path.join(d, "Cell200_8x8.h5"), "w") as f:
        f.create_dataset("CellCounts", data=counts)
        f.create_dataset("IMGs_grey", data=grey)
    return d, dict(yaws=yaws, images=images, ages=ages, angles=angles,
                   counts=counts, grey=grey)


# ------------------------------------------------------------------ tests

def test_rc49_parity_deterministic(h5dir):
    """Cap non-binding: the selected multiset and normalization must be
    IDENTICAL to the reference pipeline, for both data splits."""
    import h5py

    d, fx = h5dir
    with h5py.File(os.path.join(d, "RC-49_8x8.h5")) as f:
        indx_train = f["indx_train"][:]
    for split in ("train", "all"):
        ours = load_rc49(d, image_size=8, min_label=10, max_label=80,
                         max_num_img_per_label=10**9, data_split=split)
        ref_im, ref_lab = ref_rc49(_to_nhwc(fx["images"]), fx["yaws"], indx_train,
                                   10, 80, 10**9, data_split=split)
        assert canonical(ours.images, ours.labels_raw) == canonical(ref_im, ref_lab)
        np.testing.assert_allclose(ours.fn_normalize(ref_lab), ref_lab / 80.0)


def test_rc49_parity_cap_binding(h5dir):
    """Cap binding: subsample identity depends on the RNG engine, but the
    per-label counts must match the reference exactly."""
    import h5py

    d, fx = h5dir
    with h5py.File(os.path.join(d, "RC-49_8x8.h5")) as f:
        indx_train = f["indx_train"][:]
    ours = load_rc49(d, image_size=8, min_label=0, max_label=90,
                     max_num_img_per_label=2, data_split="train")
    ref_im, ref_lab = ref_rc49(_to_nhwc(fx["images"]), fx["yaws"], indx_train,
                               0, 90, 2, data_split="train")
    assert label_counts(ours.labels_raw) == label_counts(ref_lab)
    # every selected image must come from its label's pool
    pool = {}
    for l, im in zip(fx["yaws"][indx_train], _to_nhwc(fx["images"])[indx_train]):
        pool.setdefault(float(l), set()).add(_digest(im))
    for l, im in zip(ours.labels_raw, ours.images):
        assert _digest(im) in pool[float(l)]


def test_utkface_parity(h5dir):
    d, fx = h5dir
    # deterministic part: subset + non-binding cap, no replication
    ours = load_utkface(d, image_size=8, min_label=3, max_label=15,
                        max_num_img_per_label=10**9,
                        num_img_per_label_after_replica=0)
    ref_im, ref_lab = ref_utkface(_to_nhwc(fx["images"]), fx["ages"], 3, 15,
                                  10**9, 0)
    assert canonical(ours.images, ours.labels_raw) == canonical(ref_im, ref_lab)

    # replication: per-label counts must match (choice draws differ by engine)
    ours_r = load_utkface(d, image_size=8, min_label=1, max_label=20,
                          max_num_img_per_label=10**9,
                          num_img_per_label_after_replica=5)
    ref_im_r, ref_lab_r = ref_utkface(_to_nhwc(fx["images"]), fx["ages"], 1, 20,
                                      10**9, 5)
    assert label_counts(ours_r.labels_raw) == label_counts(ref_lab_r)


def test_steeringangle_parity(h5dir):
    d, fx = h5dir
    ours = load_steeringangle(d, image_size=8, min_label=-60, max_label=60,
                              max_num_img_per_label=10**9)
    ref_im, ref_lab, ref_norm = ref_steeringangle(
        _to_nhwc(fx["images"]), fx["angles"], -60, 60, 10**9)
    assert canonical(ours.images, ours.labels_raw) == canonical(ref_im, ref_lab)
    # shift normalization agrees elementwise with the reference closure
    np.testing.assert_allclose(ours.fn_normalize(ref_lab), ref_norm(ref_lab),
                               atol=1e-12)
    np.testing.assert_allclose(
        ours.fn_denormalize(ours.fn_normalize(ref_lab)), ref_lab, atol=1e-9)


def test_cell200_parity(h5dir):
    """Fully deterministic pipeline (first-N per strided label): exact
    multiset parity, strict."""
    d, fx = h5dir
    ours = load_cell200(d, image_size=8, min_label=1, max_label=40,
                        stepsize=3, num_imgs_per_label=2)
    ref_im, ref_lab = ref_cell200(_to_nhwc(fx["grey"]), fx["counts"],
                                  1, 40, 3, 2)
    assert canonical(ours.images, ours.labels_raw) == canonical(ref_im, ref_lab)
    np.testing.assert_allclose(ours.fn_normalize(ref_lab), ref_lab / 40.0)
