#!/usr/bin/env python
"""Export one of this framework's checkpoints to the reference torch format.

Inverse of scripts/import_torch_model.py: produces a ``.pth`` state_dict +
``.json`` sidecar pair that the reference tool loads directly
(src/utils/unets.py:60-78 get_weights, src/inference/infer.py:83-86), so
TPU-trained models run in the reference GPU application:

    python scripts/export_torch_model.py --ckpt models/mytrainset/distance_model_01 \\
        --out exported/
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser(
        description="microbeseg_tpu .ckpt -> reference .pth")
    parser.add_argument("--ckpt", required=True, type=str,
                        help="checkpoint path (.ckpt or stem)")
    parser.add_argument("--out", required=True, type=str,
                        help="output directory for the .pth + .json pair")
    args = parser.parse_args()

    from microbeseg_tpu.models.torch_import import export_torch_checkpoint

    pth = export_torch_checkpoint(Path(args.ckpt), Path(args.out))
    print(f"exported -> {pth}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
