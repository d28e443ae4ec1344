from ccdm_tpu.embedding.analytic import (
    sinusoidal_embedding,
    gaussian_fourier_embedding,
    make_fn_y2h,
    make_fn_y2cov,
)
