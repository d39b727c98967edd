from microbeseg_tpu.evaluation.metrics import (  # noqa: F401
    get_dice_1,
    get_fast_aji,
    get_fast_aji_plus,
    get_fast_dice_2,
    get_fast_pq,
    remap_label,
)
from microbeseg_tpu.evaluation.evaluator import Evaluator  # noqa: F401
