from ccdm_tpu.models.unet import Unet
from ccdm_tpu.models.vit import ViT
