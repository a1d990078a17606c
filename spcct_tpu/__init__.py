# spcct_tpu — TPU-native SPCCT multi-material segmentation framework.
#
# From-scratch JAX/XLA/Pallas rebuild of the capabilities of
# NF-91/spff-unet-spcct (see SURVEY.md for the reference analysis and
# COMPONENTS.md for the component-by-component parity map).
__version__ = "0.1.0"

from . import config  # noqa: F401

__all__ = ["config", "losses", "metrics"]
