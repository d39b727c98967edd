"""Numpy/scipy reference implementations used as test oracles.

skimage is not available in this environment, so the behaviors the reference
gets from skimage (measure.label, watershed, regionprops) are re-derived here
in plain numpy/scipy with matching semantics:

- label_oracle: 8-connected labeling (skimage.measure.label default).
- watershed_oracle: heap-based priority flood with FIFO tie-break and
  4-connectivity (skimage.segmentation.watershed defaults).
- regionprops axes from raw central moments (skimage inertia tensor).
"""

from __future__ import annotations

import heapq

import numpy as np
from scipy import ndimage

EIGHT = np.ones((3, 3), dtype=bool)
FOUR = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)


def label_oracle(mask: np.ndarray, connectivity: int = 2) -> np.ndarray:
    structure = EIGHT if connectivity == 2 else FOUR
    lab, _ = ndimage.label(np.asarray(mask) > 0, structure=structure)
    return lab.astype(np.int32)


def watershed_oracle(image: np.ndarray, markers: np.ndarray,
                     mask: np.ndarray) -> np.ndarray:
    """skimage-semantics marker watershed: priority queue ordered by
    (image value, insertion age); labels assigned when first reached;
    4-connectivity."""
    image = np.asarray(image, dtype=np.float64)
    mask = np.asarray(mask, dtype=bool)
    labels = np.where(mask, np.asarray(markers, dtype=np.int64), 0)
    H, W = image.shape
    heap = []
    age = 0
    ys, xs = np.nonzero(labels > 0)
    order = np.argsort(image[ys, xs], kind="stable")
    for i in order:
        y, x = int(ys[i]), int(xs[i])
        heapq.heappush(heap, (image[y, x], age, y, x))
        age += 1
    while heap:
        _, _, y, x = heapq.heappop(heap)
        lbl = labels[y, x]
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            ny, nx = y + dy, x + dx
            if 0 <= ny < H and 0 <= nx < W and mask[ny, nx] and labels[ny, nx] == 0:
                labels[ny, nx] = lbl
                heapq.heappush(heap, (image[ny, nx], age, ny, nx))
                age += 1
    return labels.astype(np.int32)


def regionprops_oracle(labels: np.ndarray):
    """Per-label area / centroid / equivalent diameter / axis lengths."""
    labels = np.asarray(labels)
    out = []
    for lbl in np.unique(labels):
        if lbl == 0:
            continue
        ys, xs = np.nonzero(labels == lbl)
        area = float(len(ys))
        cy, cx = ys.mean(), xs.mean()
        mu20 = ((ys - cy) ** 2).mean()
        mu02 = ((xs - cx) ** 2).mean()
        mu11 = ((ys - cy) * (xs - cx)).mean()
        common = np.sqrt(max((mu20 - mu02) ** 2 + 4 * mu11 ** 2, 0.0))
        l1 = (mu20 + mu02 + common) / 2
        l2 = (mu20 + mu02 - common) / 2
        out.append(dict(
            label=int(lbl), area=area, centroid=(cy, cx),
            equivalent_diameter=np.sqrt(4 * area / np.pi),
            major_axis_length=4 * np.sqrt(max(l1, 0)),
            minor_axis_length=4 * np.sqrt(max(l2, 0)),
        ))
    return out


def masks_iou(a: np.ndarray, b: np.ndarray) -> float:
    """Mean best-IoU agreement between two instance segmentations (symmetric
    partition agreement on the foreground)."""
    a = np.asarray(a)
    b = np.asarray(b)
    fg = (a > 0) | (b > 0)
    if not fg.any():
        return 1.0
    total = 0.0
    weight = 0.0
    for src, dst in ((a, b), (b, a)):
        for lbl in np.unique(src[src > 0]):
            m = src == lbl
            ids, counts = np.unique(dst[m], return_counts=True)
            best = 0.0
            for i, c in zip(ids, counts):
                if i == 0:
                    continue
                inter = c
                union = m.sum() + (dst == i).sum() - inter
                best = max(best, inter / union)
            total += best * m.sum()
            weight += m.sum()
    return total / max(weight, 1.0)


def partition_equal(a: np.ndarray, b: np.ndarray) -> bool:
    """True if two label images define the same partition (ids may differ)."""
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    if ((a > 0) != (b > 0)).any():
        return False
    pairs = set(zip(a[a > 0].tolist(), b[a > 0].tolist()))
    return (len(pairs) == len(set(p[0] for p in pairs))
            and len(pairs) == len(set(p[1] for p in pairs)))


# ---------------------------------------------------------------------------
# Label-generation oracles: faithful numpy/scipy implementations of the
# reference algorithms (train_data_representations.py) for golden tests.
# ---------------------------------------------------------------------------

def _disk(radius):
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (x * x + y * y) <= radius * radius


def boundary_label_oracle(label):
    label_bin = label > 0
    kernel = np.ones((3, 3), dtype=np.uint8)
    boundary = np.zeros(label.shape, dtype=bool)
    for nid in np.unique(label[label > 0]):
        nucleus = label == nid
        boundary |= ndimage.binary_dilation(nucleus, kernel) ^ nucleus
    return np.maximum(label_bin, 2 * boundary).astype(np.uint8)


def border_label_oracle(label):
    label_bin = label > 0
    kernel = np.ones((3, 3), dtype=np.uint8)
    boundary = np.zeros(label.shape, dtype=bool)
    for nid in np.unique(label[label > 0]):
        nucleus = label == nid
        boundary |= ndimage.binary_dilation(nucleus, kernel) ^ nucleus
    border = boundary ^ (ndimage.binary_dilation(label_bin, kernel) ^ label_bin)
    return np.maximum(label_bin, 2 * border).astype(np.uint8)


def bottom_hat_closing_oracle(label, neighbor_dist):
    label_bin = np.zeros(label.shape, dtype=bool)
    for nid in np.unique(label[label > 0]):
        nucleus = label == nid
        label_bin[ndimage.binary_closing(nucleus, _disk(3))] = True
    bottom_hat = ndimage.binary_closing(label_bin, _disk(3)) ^ label_bin
    closed = label_oracle(bottom_hat, connectivity=2)
    corr = (closed > 0).astype(np.float32)
    props = regionprops_oracle(closed)
    for p in props:
        if p["minor_axis_length"] >= 3:
            gap = closed == p["label"]
            gap_border = gap ^ ndimage.binary_erosion(gap, FOUR)
            corr[gap] = 1.0
            corr[gap_border] = 0.8
    kernel = np.ones((3, 3), dtype=np.uint8)
    for p in props:
        obj = closed == p["label"]
        ring = ndimage.binary_dilation(obj, kernel) ^ obj
        area = p["area"]
        th = 5 if area <= 20 else 8 if area <= 30 else 10 if area <= 50 else 20
        if np.sum(ring * neighbor_dist) < th:
            corr[obj] = 0
    return corr


def distance_label_oracle(label, search_radius):
    """Reference distance_label (:261-361) on numpy/scipy."""
    label = np.asarray(label)
    label_dist = np.zeros(label.shape, dtype=np.float64)
    label_nb = np.zeros(label.shape, dtype=np.float64)
    label_border = border_label_oracle(label) == 2
    props = regionprops_oracle(label)
    for p in props:
        nucleus = label == p["label"]
        cy, cx = np.round(p["centroid"])
        sl = (slice(int(max(cy - search_radius, 0)),
                    int(min(cy + search_radius, label.shape[0]))),
              slice(int(max(cx - search_radius, 0)),
                    int(min(cx + search_radius, label.shape[1]))))
        crop = nucleus[sl]
        crop_dist = ndimage.distance_transform_edt(crop)
        max_dist = crop_dist.max()
        if max_dist > 0:
            crop_dist = crop_dist / max_dist
        else:
            continue
        label_dist[sl] += crop_dist

        nb_crop = np.copy(label[sl])
        if len(np.unique(nb_crop[nb_crop > 0])) <= 1:
            continue
        crop_nucleus = nb_crop == p["label"]
        nb_crop[nb_crop == 0] = p["label"]
        nb_crop[nb_crop != p["label"]] = 0
        nb_dist = ndimage.distance_transform_edt(nb_crop > 0) * crop_nucleus
        if nb_dist.max() > 0:
            denom = min(max_dist + 3, nb_dist.max())
            nb_dist = np.clip(nb_dist / denom, 0, 1)
        else:
            nb_dist = 1
        label_nb[sl] += (1 - nb_dist) * crop_nucleus

    corr = bottom_hat_closing_oracle(label, label_nb)
    label_nb = np.maximum(label_nb, corr)
    label_nb = np.maximum(label_nb, label_border.astype(np.float64))
    label_nb = 1 / np.sqrt(0.65 + 0.5 * np.exp(-11 * (label_nb - 0.75))) - 0.19
    label_nb = np.clip(label_nb, 0, 1)
    label_nb = ndimage.grey_closing(label_nb, size=(3, 3))
    return label_dist.astype(np.float32), label_nb.astype(np.float32)


def distance_postprocessing_oracle(border_pred, cell_pred, th_seed, th_cell):
    """Reference distance_postprocessing (postprocessing.py:7-59)."""
    cell = ndimage.gaussian_filter(np.asarray(cell_pred, np.float32), 0.5)
    border = np.clip(np.asarray(border_pred, np.float32), 0, 1)
    mask = cell > th_cell
    borders = np.tan(border ** 2)
    borders[borders < 0.05] = 0
    borders = np.clip(borders, 0, 1)
    seeds = label_oracle((cell - borders) > th_seed)
    areas = [p["area"] for p in regionprops_oracle(seeds)]
    min_area = max(0.10 * np.mean(areas), 4) if areas else 4
    for p in regionprops_oracle(seeds):
        if p["area"] <= min_area:
            seeds[seeds == p["label"]] = 0
    seeds = label_oracle(seeds > 0)
    return watershed_oracle(-cell, seeds, mask).astype(np.uint16)


def boundary_postprocessing_oracle(prediction):
    """Reference boundary_postprocessing (postprocessing.py:62-90)."""
    prediction = np.asarray(prediction, np.float32)
    pred_bin = np.argmax(prediction, axis=-1)
    mask = pred_bin == 1
    seeds = label_oracle((prediction[..., 1] * (1 - prediction[..., 2])) > 0.5)
    for p in regionprops_oracle(seeds):
        if p["area"] <= 4:
            seeds[seeds == p["label"]] = 0
    seeds = label_oracle(seeds > 0)
    return watershed_oracle(-mask.astype(np.float64), seeds, mask).astype(np.uint16)
