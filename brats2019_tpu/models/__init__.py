from .unet3d import UNet3D, UNetConfig  # noqa: F401
