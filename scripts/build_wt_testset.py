"""Second, INDEPENDENT real test set (VERDICT r4 item 4).

The quantitative real rows all score on frames 40-49 of the one
glutamicum.gif time-lapse — temporally correlated with the train frames
(same colony, same field of view).  The reference docs carry real
phase-contrast pixels of two OTHER fields with the reference tool's own
outline annotation:

  wt_colony  /root/reference/doc/pre-labeling.png, left panel: a 320^2
             1:1 crop of "experiment 02 / WT_1h_15.tif" with the
             reference's pre-label outlines (~100 rods, dense colony).
  wv_colony  /root/reference/doc/webviewer.png: the OMERO webviewer
             showing img_003.tif (dataset 1317) at 235% zoom with the
             reference's uploaded ROI outlines (59 ROIs).  The panel is
             cropped clear of UI chrome, restored, rasterized at zoom
             resolution, then downsampled 1/2.35 back to native pixel
             pitch (image: Lanczos, instance mask: nearest).

Both are rasterized exactly like the main corpus
(scripts/build_real_corpus.py: inpaint yellow -> 4-connected components
-> border/area/intensity filters -> EDT wall splitting), inheriting the
same GT caveat: the annotation is the reference model's own output at
8-bit screenshot resolution.  Cells cut by a panel edge become
background (border-touching components), and evaluation's border
correction (utils/image.py) discounts that rim on both sides.

Usage: python scripts/build_wt_testset.py [--out data/real_wt]
Then score models with the extended seed grid, e.g.:
  python eval_script.py --data data/real_wt --models <stem> \
      --th_seeds 0.35 0.45 0.55 0.65 0.75
(data/real_wt/test/ is the eval layout; raw polarity — invert for
models trained on inverted frames.)
"""

import argparse
import sys
from pathlib import Path

import numpy as np
from PIL import Image
from scipy import ndimage

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from scripts.build_real_corpus import (color_mask, outlines_to_instances,  # noqa: E402
                                       restore_and_outline)

PANELS = [
    # (name, file, (y0, y1, x0, x1), zoom)
    ("wt_colony", "/root/reference/doc/pre-labeling.png",
     (143, 463, 18, 336), 1.0),
    ("wv_colony", "/root/reference/doc/webviewer.png",
     (191, 755, 111, 576), 2.35),
]


def build_panel(path: str, box, zoom: float):
    rgb = np.asarray(Image.open(path).convert("RGB"))
    y0, y1, x0, x1 = box
    img, yellow = restore_and_outline(rgb[y0:y1, x0:x1])
    mask = outlines_to_instances(yellow, img,
                                 min_area=int(round(25 * zoom * zoom)),
                                 max_reach=3.0 * zoom)
    if zoom != 1.0:
        h, w = img.shape
        nh, nw = int(round(h / zoom)), int(round(w / zoom))
        img = np.asarray(Image.fromarray(img).resize(
            (nw, nh), Image.LANCZOS))
        mask = np.asarray(Image.fromarray(mask).resize(
            (nw, nh), Image.NEAREST))
    return img, mask


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=str(ROOT / "data" / "real_wt"))
    args = p.parse_args(argv)
    from microbeseg_tpu.utils.tiff import imwrite

    out = Path(args.out)
    (out / "review").mkdir(parents=True, exist_ok=True)
    (out / "test").mkdir(parents=True, exist_ok=True)
    for i, (name, path, box, zoom) in enumerate(PANELS):
        img, mask = build_panel(path, box, zoom)
        imwrite(out / "test" / f"img_{i:02d}.tif",
                img.astype(np.uint16) * 257)
        imwrite(out / "test" / f"mask_{i:02d}.tif", mask.astype(np.uint16))
        ov = np.stack([img] * 3, axis=-1).astype(np.uint8)
        edge = (ndimage.grey_erosion(mask, size=(3, 3)) != mask) & (mask > 0)
        ov[edge] = (255, 60, 60)
        Image.fromarray(np.concatenate(
            [ov, color_mask(mask)], axis=1)).save(
            out / "review" / f"{name}.png")
        print(f"{name}: {img.shape} {int(mask.max())} instances")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
