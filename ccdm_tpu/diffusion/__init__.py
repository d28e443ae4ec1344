from ccdm_tpu.diffusion.gaussian import GaussianDiffusion, DiffusionConfig
