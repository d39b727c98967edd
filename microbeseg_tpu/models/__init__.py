from microbeseg_tpu.models.unet import DUNet, UNet, build_unet  # noqa: F401
from microbeseg_tpu.models.io import (  # noqa: F401
    load_checkpoint,
    load_model,
    save_checkpoint,
)
