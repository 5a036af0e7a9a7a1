from exemplar_vae_tpu.ops import distributions  # noqa: F401
