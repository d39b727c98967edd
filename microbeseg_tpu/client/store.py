"""Image-store abstraction: OMERO gateway or local filesystem.

The reference talks to an OMERO server through BlitzGateway's narrow surface
(getPlane, polygon ROIs, map annotations, file annotations; SURVEY.md §4(e),
reference call sites e.g. src/inference/infer.py:96-111,
src/utils/data_export.py:38-42).  This module defines that surface as an
explicit ``ImageStore`` interface with two implementations:

- ``OmeroStore``: wraps a live BlitzGateway connection (import-gated; omero-py
  is not in this environment, so it raises a clear error if unavailable);
- ``LocalStore``: filesystem-backed implementation of the same surface, used
  for offline operation and as the recorded-fixture fake in tests.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from microbeseg_tpu.utils.tiff import imread, imwrite

ANALYSIS_NAMESPACE = "microbeseg.analysis.namespace"


@dataclass
class ImageRef:
    image_id: int
    name: str
    size_t: int
    size_c: int
    size_z: int
    size_y: int
    size_x: int
    dataset_id: int = -1


@dataclass
class RoiPolygon:
    """One polygon ROI: t/z plane plus an OMERO-style points string."""
    t: int
    z: int
    points: str


class ImageStore:
    """Interface — see LocalStore for the reference implementation."""

    def list_images(self, dataset_id: int) -> List[ImageRef]:
        raise NotImplementedError

    def get_image(self, image_id: int) -> ImageRef:
        raise NotImplementedError

    def get_plane(self, image_id: int, z: int, c: int, t: int) -> np.ndarray:
        raise NotImplementedError

    def upload_image(self, dataset_id: int, name: str,
                     stack: np.ndarray) -> int:
        raise NotImplementedError

    def get_map_annotation(self, image_id: int) -> Dict[str, str]:
        raise NotImplementedError

    def set_map_annotation(self, image_id: int, kv: Dict[str, str]) -> None:
        raise NotImplementedError

    def get_polygons(self, image_id: int) -> List[RoiPolygon]:
        raise NotImplementedError

    def add_polygons(self, image_id: int, polys: List[RoiPolygon]) -> None:
        raise NotImplementedError

    def delete_polygons(self, image_id: int) -> None:
        raise NotImplementedError

    def attach_file(self, image_id: int, path: Path,
                    namespace: str = "") -> None:
        raise NotImplementedError

    def list_attachments(self, image_id: int,
                         namespace: Optional[str] = None) -> List[str]:
        raise NotImplementedError

    def download_attachment(self, image_id: int, name: str,
                            target: Path) -> Optional[Path]:
        raise NotImplementedError

    def delete_attachments(self, image_id: int,
                           namespace: Optional[str] = None) -> None:
        raise NotImplementedError

    def create_dataset(self, name: str) -> int:
        raise NotImplementedError

    def dataset_name(self, dataset_id: int) -> str:
        raise NotImplementedError


class LocalStore(ImageStore):
    """Filesystem-backed store.

    Layout: root/datasets/{id}/meta.json, root/images/{id}/
    {data.tif, meta.json, map.json, rois.json, attachments/}.
    """

    def __init__(self, root: Path):
        self.root = Path(root)
        (self.root / "datasets").mkdir(parents=True, exist_ok=True)
        (self.root / "images").mkdir(parents=True, exist_ok=True)

    # -- helpers -------------------------------------------------------
    def _next_id(self, kind: str) -> int:
        existing = [int(p.name) for p in (self.root / kind).iterdir()
                    if p.name.isdigit()]
        return (max(existing) + 1) if existing else 1

    def _img_dir(self, image_id: int) -> Path:
        d = self.root / "images" / str(image_id)
        if not d.is_dir():
            raise KeyError(f"image {image_id} not found")
        return d

    def _read_json(self, p: Path, default):
        return json.loads(p.read_text()) if p.is_file() else default

    # -- datasets ------------------------------------------------------
    def create_dataset(self, name: str) -> int:
        did = self._next_id("datasets")
        d = self.root / "datasets" / str(did)
        d.mkdir()
        (d / "meta.json").write_text(json.dumps({"name": name}))
        return did

    def dataset_name(self, dataset_id: int) -> str:
        meta = self._read_json(
            self.root / "datasets" / str(dataset_id) / "meta.json", {})
        return meta.get("name", str(dataset_id))

    def list_images(self, dataset_id: int) -> List[ImageRef]:
        out = []
        for p in sorted((self.root / "images").iterdir(),
                        key=lambda q: int(q.name) if q.name.isdigit() else 0):
            meta = self._read_json(p / "meta.json", {})
            if meta.get("dataset_id") == dataset_id:
                out.append(self.get_image(int(p.name)))
        return out

    # -- images --------------------------------------------------------
    def upload_image(self, dataset_id: int, name: str,
                     stack: np.ndarray) -> int:
        stack = np.asarray(stack)
        if stack.ndim == 2:
            stack = stack[None]
        iid = self._next_id("images")
        d = self.root / "images" / str(iid)
        (d / "attachments").mkdir(parents=True)
        imwrite(d / "data.tif", stack)
        meta = {"name": name, "dataset_id": dataset_id,
                "size_t": int(stack.shape[0]), "size_c": 1, "size_z": 1,
                "size_y": int(stack.shape[1]), "size_x": int(stack.shape[2])}
        (d / "meta.json").write_text(json.dumps(meta))
        return iid

    def get_image(self, image_id: int) -> ImageRef:
        meta = self._read_json(self._img_dir(image_id) / "meta.json", {})
        return ImageRef(image_id=image_id, name=meta.get("name", ""),
                        size_t=meta.get("size_t", 1),
                        size_c=meta.get("size_c", 1),
                        size_z=meta.get("size_z", 1),
                        size_y=meta.get("size_y", 0),
                        size_x=meta.get("size_x", 0),
                        dataset_id=meta.get("dataset_id", -1))

    def get_plane(self, image_id: int, z: int, c: int, t: int) -> np.ndarray:
        data = imread(self._img_dir(image_id) / "data.tif")
        if data.ndim == 2:
            data = data[None]
        return data[t]

    # -- map annotations ----------------------------------------------
    def get_map_annotation(self, image_id: int) -> Dict[str, str]:
        return self._read_json(self._img_dir(image_id) / "map.json", {})

    def set_map_annotation(self, image_id: int, kv: Dict[str, str]) -> None:
        d = self._img_dir(image_id)
        cur = self._read_json(d / "map.json", {})
        cur.update({k: str(v) for k, v in kv.items()})
        (d / "map.json").write_text(json.dumps(cur))

    # -- ROIs ----------------------------------------------------------
    def get_polygons(self, image_id: int) -> List[RoiPolygon]:
        raw = self._read_json(self._img_dir(image_id) / "rois.json", [])
        return [RoiPolygon(**r) for r in raw]

    def add_polygons(self, image_id: int, polys: List[RoiPolygon]) -> None:
        d = self._img_dir(image_id)
        cur = self._read_json(d / "rois.json", [])
        cur.extend({"t": p.t, "z": p.z, "points": p.points} for p in polys)
        (d / "rois.json").write_text(json.dumps(cur))

    def delete_polygons(self, image_id: int) -> None:
        p = self._img_dir(image_id) / "rois.json"
        if p.is_file():
            p.unlink()

    # -- attachments ---------------------------------------------------
    def attach_file(self, image_id: int, path: Path,
                    namespace: str = "") -> None:
        d = self._img_dir(image_id) / "attachments"
        target = d / Path(path).name
        target.write_bytes(Path(path).read_bytes())
        ns = self._read_json(d / "_namespaces.json", {})
        ns[Path(path).name] = namespace
        (d / "_namespaces.json").write_text(json.dumps(ns))

    def list_attachments(self, image_id: int,
                         namespace: Optional[str] = None) -> List[str]:
        d = self._img_dir(image_id) / "attachments"
        ns = self._read_json(d / "_namespaces.json", {})
        out = []
        for f in sorted(d.iterdir()):
            if f.name.startswith("_"):
                continue
            if namespace is None or ns.get(f.name, "") == namespace:
                out.append(f.name)
        return out

    def download_attachment(self, image_id: int, name: str,
                            target: Path) -> Optional[Path]:
        src = self._img_dir(image_id) / "attachments" / name
        if not src.is_file():
            return None
        target = Path(target)
        target.write_bytes(src.read_bytes())
        return target

    def delete_attachments(self, image_id: int,
                           namespace: Optional[str] = None) -> None:
        d = self._img_dir(image_id) / "attachments"
        ns = self._read_json(d / "_namespaces.json", {})
        for f in list(d.iterdir()):
            if f.name.startswith("_"):
                continue
            if namespace is None or ns.get(f.name, "") == namespace:
                f.unlink()
                ns.pop(f.name, None)
        (d / "_namespaces.json").write_text(json.dumps(ns))


class OmeroStore(ImageStore):
    """BlitzGateway-backed store (requires omero-py; import-gated)."""

    def __init__(self, username: str, password: str, host: str, port: int):
        try:
            from omero.gateway import BlitzGateway  # type: ignore
        except ImportError as exc:  # pragma: no cover - omero not in env
            raise ImportError(
                "omero-py is not installed; use LocalStore for offline "
                "operation or install omero-py for server-backed workflows"
            ) from exc
        self._conn = BlitzGateway(username, password, host=host, port=port,
                                  secure=True)
        if not self._conn.connect():
            raise ConnectionError("No OMERO connection possible. "
                                  "Check inputs or connection.")

    # The full BlitzGateway mapping mirrors the reference's call sites; it is
    # exercised only against a live server, hence kept minimal here.
    def list_images(self, dataset_id: int):  # pragma: no cover
        ds = self._conn.getObject("Dataset", dataset_id)
        out = []
        for img in ds.listChildren():
            out.append(ImageRef(
                image_id=img.getId(), name=img.getName(),
                size_t=img.getSizeT(), size_c=img.getSizeC(),
                size_z=img.getSizeZ(), size_y=img.getSizeY(),
                size_x=img.getSizeX(), dataset_id=dataset_id))
        return out

    def get_plane(self, image_id, z, c, t):  # pragma: no cover
        img = self._conn.getObject("Image", image_id)
        return np.asarray(img.getPrimaryPixels().getPlane(z, c, t))

    def close(self):  # pragma: no cover
        self._conn.close()


def timestamp() -> str:
    return time.strftime("%Y-%m-%d %H:%M:%S")
