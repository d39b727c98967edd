from microbeseg_tpu.training.losses import get_loss  # noqa: F401
from microbeseg_tpu.training.optimizers import build_optimizer, ranger  # noqa: F401
from microbeseg_tpu.training.schedules import (  # noqa: F401
    CosineAnnealingLR,
    ReduceLROnPlateau,
)
