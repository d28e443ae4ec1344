from ccdm_tpu.data.datasets import DatasetBundle, load_dataset, make_synthetic
