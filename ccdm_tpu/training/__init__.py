from ccdm_tpu.training.trainer import Trainer, TrainerConfig
