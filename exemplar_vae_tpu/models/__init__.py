"""Model registry (reference: main.py's importlib model dispatch [U])."""

from exemplar_vae_tpu.config import Config


def create_model(cfg: Config):
    name = cfg.model_name.lower()
    if name == "vae":
        from exemplar_vae_tpu.models.vae import VAE
        return VAE(cfg)
    if name in ("hvae_2level", "hvae"):
        from exemplar_vae_tpu.models.hvae import HVAE
        return HVAE(cfg)
    if name in ("convhvae_2level", "convhvae", "conv_hvae"):
        from exemplar_vae_tpu.models.conv_hvae import ConvHVAE
        return ConvHVAE(cfg)
    if name in ("pixelhvae_2level", "pixelhvae", "pixel_hvae"):
        from exemplar_vae_tpu.models.pixel_hvae import PixelHVAE
        return PixelHVAE(cfg)
    raise ValueError(f"unknown model_name: {cfg.model_name}")


MODEL_NAMES = ("vae", "hvae_2level", "convhvae_2level", "pixelhvae_2level")
