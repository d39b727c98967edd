from microbeseg_tpu.ops.filters import gaussian_filter  # noqa: F401
from microbeseg_tpu.ops.morphology import (  # noqa: F401
    binary_closing,
    binary_dilation,
    binary_erosion,
    disk,
    grey_closing,
)
from microbeseg_tpu.ops.edt import edt  # noqa: F401
from microbeseg_tpu.ops.cc import connected_components, relabel_sequential  # noqa: F401
from microbeseg_tpu.ops.regionprops import regionprops  # noqa: F401
from microbeseg_tpu.ops.watershed import watershed  # noqa: F401
