from .builder import VQVAE, build_vae

__all__ = ["VQVAE", "build_vae"]
