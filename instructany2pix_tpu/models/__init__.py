from . import clip, layers, unet, vae

__all__ = ["clip", "layers", "unet", "vae"]
