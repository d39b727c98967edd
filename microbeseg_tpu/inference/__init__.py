from microbeseg_tpu.inference.engine import InferenceEngine  # noqa: F401
from microbeseg_tpu.inference.tiling import stitch_predictions, tile_positions  # noqa: F401
