from ccdm_tpu.eval.metrics import (
    frechet_distance,
    extract_features,
    cal_FID,
    cal_labelscore,
    predict_class_labels,
    compute_entropy,
    inception_score,
    compute_prdc,
    intra_class_fid,
)
from ccdm_tpu.eval.sfid import sliding_window_eval
from ccdm_tpu.eval.niqe import (
    NIQEModel,
    fit_niqe_model,
    niqe_score,
    default_patch_for,
)
