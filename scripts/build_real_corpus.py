"""Build a REAL-microscopy quantitative corpus from the reference's docs.

/root/reference/doc/glutamicum.gif is a 50-frame 256^2 time-lapse of a
growing C. glutamicum colony (phase contrast, dark cells on gray) with the
reference tool's own segmentation drawn as 1-2 px yellow outlines — i.e.
real microscope pixels plus the reference's published instance annotation,
the only ground-truth-grade real data reachable in this offline environment
(the Zenodo datasets of reference README.md:153-157 need network).

Per frame this script:
  1. restores the grayscale image by inpainting the yellow overlay pixels
     from their neighborhood (same recovery as segment_real_doc_images.py;
     off-overlay pixels are exactly grayscale in the GIF),
  2. rasterizes the outlines into an instance mask: connected components of
     the non-yellow pixels (4-connectivity, so 1 px walls separate),
     components touching the frame border = background, area-filtered
     interiors = instances, then outline pixels are assigned to the nearest
     interior within 3 px (EDT nearest-label), giving closed instances whose
     shared walls split fairly between touching cells,
  3. writes img_{i:02d}.tif (uint16, raw polarity), mask_{i:02d}.tif
     (uint16 instances) and a review overlay png.

The GT inherits the reference segmentation's own quality at 8-bit GIF
resolution; frames of one time-lapse are temporally correlated — both
caveats are recorded in docs/E2E_RESULTS.md where the numbers land.

Usage: python scripts/build_real_corpus.py [--out data/real_glutamicum]
"""

import argparse
import sys
from pathlib import Path

import numpy as np
from PIL import Image
from scipy import ndimage

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

GIF = Path("/root/reference/doc/glutamicum.gif")


def restore_and_outline(rgb: np.ndarray):
    """(restored uint8 grayscale, yellow-outline bool mask)."""
    a = rgb.astype(np.int32)
    yellow = (a[..., 0] - a[..., 2] > 30) & (a[..., 1] - a[..., 2] > 30)
    img = a.mean(axis=-1)
    known = ~yellow
    while not known.all():
        s = ndimage.uniform_filter(np.where(known, img, 0.0), 3)
        c = ndimage.uniform_filter(known.astype(float), 3)
        fill = (c > 0) & ~known
        img[fill] = s[fill] / c[fill]
        known |= fill
    return np.clip(img, 0, 255).astype(np.uint8), yellow


def outlines_to_instances(yellow: np.ndarray, img: np.ndarray,
                          min_area: int = 25,
                          max_reach: float = 3.0) -> np.ndarray:
    """Closed yellow contours -> uint16 instance mask (0 = background).

    ``img`` (restored grayscale) rejects enclosed BACKGROUND interstices:
    phase-contrast cells are darker than the background gray, while the
    halo pockets enclosed between touching cells are brighter — a
    non-border component only becomes an instance if its mean intensity is
    below the background level (median over the border-touching components;
    the full-frame median would sit at CELL gray in dense frames)."""
    comp, _ = ndimage.label(~yellow,
                            structure=np.array([[0, 1, 0],
                                                [1, 1, 1],
                                                [0, 1, 0]]))
    border_ids = np.unique(np.concatenate([
        comp[0], comp[-1], comp[:, 0], comp[:, -1]]))
    bg_level = float(np.median(img[np.isin(comp, border_ids) & (comp > 0)]))
    means = ndimage.mean(img, labels=comp,
                         index=np.arange(comp.max() + 1))
    mask = np.zeros(yellow.shape, np.uint16)
    nxt = 1
    for cid, area in zip(*np.unique(comp, return_counts=True)):
        if (cid == 0 or cid in border_ids or area < min_area
                or means[cid] >= bg_level):
            continue
        mask[comp == cid] = nxt
        nxt += 1
    # assign outline pixels to the nearest interior instance (<= max_reach):
    # shared walls between touching cells split at the midline
    dist, (iy, ix) = ndimage.distance_transform_edt(mask == 0,
                                                    return_indices=True)
    assignable = (mask == 0) & yellow & (dist <= max_reach)
    mask[assignable] = mask[iy[assignable], ix[assignable]]
    return mask


def color_mask(mask: np.ndarray) -> np.ndarray:
    rng = np.random.default_rng(0)
    lut = rng.integers(60, 255, (int(mask.max()) + 1, 3), dtype=np.uint8)
    lut[0] = 0
    return lut[mask]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=str(ROOT / "data" / "real_glutamicum"))
    args = p.parse_args(argv)
    from microbeseg_tpu.utils.tiff import imwrite

    out = Path(args.out)
    (out / "review").mkdir(parents=True, exist_ok=True)
    im = Image.open(GIF)
    counts = []
    for i in range(im.n_frames):
        im.seek(i)
        rgb = np.asarray(im.convert("RGB"))
        img, yellow = restore_and_outline(rgb)
        mask = outlines_to_instances(yellow, img)
        counts.append(int(mask.max()))
        imwrite(out / f"img_{i:02d}.tif", img.astype(np.uint16) * 257)
        imwrite(out / f"mask_{i:02d}.tif", mask)
        ov = np.stack([img] * 3, axis=-1)
        edge = (ndimage.grey_erosion(mask, size=(3, 3)) != mask) & (mask > 0)
        ov[edge] = (255, 60, 60)
        Image.fromarray(np.concatenate(
            [ov, color_mask(mask)], axis=1)).save(
            out / "review" / f"frame_{i:02d}.png")
    print(f"{im.n_frames} frames -> {out}; instances/frame: "
          f"min {min(counts)} max {max(counts)} "
          f"(first 5: {counts[:5]}, last 5: {counts[-5:]})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
