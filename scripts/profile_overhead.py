"""Localize the non-conv cost of the train fwd+bwd (round-3 follow-up).

scripts/bench_conv_bwd.py measured all flagship conv3x3 layers fwd+bwd in
isolation at ~1.9 ms/crop while the full model runs 5.5 ms/crop — the
majority of the step is OUTSIDE the conv kernels.  This script strips
components one at a time (identity activation, no norm, max pool) to
attribute the overhead:

Usage: python scripts/profile_overhead.py [keys...]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from scripts.profile_backward import fwd_bwd_ms  # noqa: E402

from microbeseg_tpu.models.unet import DUNet  # noqa: E402


VARIANTS = {
    "base":       dict(act_fun="mish", normalization="bn", pool_method="conv"),
    "relu":       dict(act_fun="relu", normalization="bn", pool_method="conv"),
    "act_linear": dict(act_fun="linear", normalization="bn",
                       pool_method="conv"),
    "norm_none":  dict(act_fun="mish", normalization="none",
                       pool_method="conv"),
    "bare":       dict(act_fun="linear", normalization="none",
                       pool_method="conv"),
    "bare_max":   dict(act_fun="linear", normalization="none",
                       pool_method="max"),
    "gn":         dict(act_fun="mish", normalization="gn",
                       pool_method="conv"),
    "in":         dict(act_fun="mish", normalization="in",
                       pool_method="conv"),
}


def main():
    keys = [k for k in sys.argv[1:] if k in VARIANTS] or list(VARIANTS)
    rng = np.random.default_rng(0)
    for key in keys:
        model = DUNet(**VARIANTS[key])
        ms = fwd_bwd_ms(model, 16, rng)
        print(f"{key:11s} {VARIANTS[key]}: fwd_bwd {ms:.3f} ms/crop "
              f"({1e3 / ms:.0f} crops/s)", flush=True)


if __name__ == "__main__":
    main()
