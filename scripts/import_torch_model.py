#!/usr/bin/env python
"""Convert a reference microbeSEG torch checkpoint to this framework.

The reference distributes trained models as a ``.pth`` state_dict plus a
``.json`` sidecar (src/training/train.py:502-515, src/utils/utils.py:94-107;
the Zenodo model zoo uses this pair).  This tool produces our ``.ckpt`` +
sidecar so those models run on TPU unchanged:

    python scripts/import_torch_model.py --pth distance_model.pth \\
        --out models/imported [--json distance_model.json] [--label_type ...]

Forward equivalence of the conversion is golden-tested against torch in
tests/test_torch_import.py (bn/gn/in, relu/mish, conv/max, U/DU).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser(
        description="reference .pth -> microbeseg_tpu .ckpt")
    parser.add_argument("--pth", required=True, type=str,
                        help="reference torch state_dict checkpoint")
    parser.add_argument("--json", default=None, type=str,
                        help="reference JSON sidecar (default: next to .pth)")
    parser.add_argument("--out", required=True, type=str,
                        help="output models directory")
    parser.add_argument("--label_type", default=None,
                        help="override the sidecar's label_type")
    args = parser.parse_args()

    from microbeseg_tpu.models.torch_import import import_torch_checkpoint

    ckpt = import_torch_checkpoint(Path(args.pth), Path(args.out),
                                   json_path=args.json,
                                   label_type=args.label_type)
    print(f"imported -> {ckpt}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
