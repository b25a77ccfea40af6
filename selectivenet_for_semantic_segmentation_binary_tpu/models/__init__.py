"""Model zoo: U-Net encoder-decoders with optional SelectiveNet heads."""

from .unet import UNet, UNetB, build_model, count_params  # noqa: F401
