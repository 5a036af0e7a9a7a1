from exemplar_vae_tpu.data.loaders import DataSplits, load_dataset  # noqa: F401
