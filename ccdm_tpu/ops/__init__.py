from ccdm_tpu.ops.schedule import (
    Schedule,
    make_schedule,
    linear_betas,
    cosine_betas,
    extract,
    q_sample,
    predict_start_from_noise,
    predict_noise_from_start,
    predict_v,
    predict_start_from_v,
    q_posterior,
)
from ccdm_tpu.ops.vicinal import (
    pairwise_distance,
    sliced_batch_weights,
    classic_batch_weights,
    hard_weights_from_targets,
    soft_weights_from_targets,
)
from ccdm_tpu.ops.guidance import project_parallel, apply_cfg
