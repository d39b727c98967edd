"""In-memory fake of the omero-py surface used by ``OmeroStore``.

SURVEY.md §4(e): the reference treats OMERO purely through BlitzGateway's
narrow surface, so the store layer is tested against a recorded-fixture-style
fake gateway.  ``install()`` registers fake ``omero``, ``omero.gateway``,
``omero.model``, ``omero.rtypes``, ``omero.constants`` modules in
``sys.modules`` and returns the shared ``FakeServer`` — the REAL
``OmeroStore`` code paths then run in tests without a server, including the
reconnect-retry guard (simulate with ``server.kill_connections()``).
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

NSCLIENTMAPANNOTATION = "openmicroscopy.org/omero/client/mapAnnotation"


class _RVal:
    """omero rtype: exposes both ``.val`` and ``.getValue()``."""

    def __init__(self, val):
        self.val = val

    def getValue(self):
        return self.val

    def __eq__(self, other):
        return isinstance(other, _RVal) and self.val == other.val


# ---------------------------------------------------------------------------
# model objects (omero.model)
# ---------------------------------------------------------------------------

class PolygonI:
    def __init__(self):
        self.theT = None
        self.theZ = None
        self.points = None

    def getTheT(self):
        return self.theT

    def getTheZ(self):
        return self.theZ

    def getPoints(self):
        return self.points


class RoiI:
    def __init__(self):
        self.id = None
        self._image_obj = None
        self._shapes = []

    def setImage(self, obj):
        self._image_obj = obj

    def addShape(self, shape):
        self._shapes.append(shape)

    def copyShapes(self):
        return list(self._shapes)


class DatasetI:
    def __init__(self, did=None, loaded=True):
        self._id = did
        self._name = None

    def setName(self, rname):
        self._name = rname

    def getId(self):
        return _RVal(self._id)


class ProjectI:
    def __init__(self, pid=None, loaded=True):
        self._id = pid


class ProjectDatasetLinkI:
    def __init__(self):
        self._parent = None
        self._child = None

    def setParent(self, p):
        self._parent = p

    def setChild(self, c):
        self._child = c


# ---------------------------------------------------------------------------
# gateway wrappers (omero.gateway)
# ---------------------------------------------------------------------------

class MapAnnotationWrapper:
    def __init__(self, conn=None):
        self._conn = conn
        self._id = None
        self._ns = ""
        self._value = []

    def setNs(self, ns):
        self._ns = ns

    def getNs(self):
        return self._ns

    def setValue(self, pairs):
        self._value = [list(p) for p in pairs]

    def getValue(self):
        return [tuple(p) for p in self._value]

    def canEdit(self):
        return True

    def getId(self):
        return self._id

    def save(self):
        if self._id is None:
            self._id = self._conn._server.new_id()


class FileAnnotationWrapper:
    def __init__(self, conn=None, name="", ns=None, content=b""):
        self._conn = conn
        self._id = None
        self._name = name
        self._ns = ns
        self._content = content

    def getNs(self):
        return self._ns

    def getFileName(self):
        return self._name

    def getId(self):
        return self._id

    def getFileInChunks(self):
        chunk = 1 << 16
        for i in range(0, max(len(self._content), 1), chunk):
            yield self._content[i:i + chunk]

    def canEdit(self):
        return True


class _FakePixels:
    def __init__(self, rec):
        self._rec = rec

    def getPlane(self, z, c, t):
        return np.array(self._rec["planes"][t, c])


class _FakeDetails:
    def __init__(self, group_id):
        self.group = types.SimpleNamespace(id=_RVal(group_id))


class _ImageWrapper:
    def __init__(self, conn, iid):
        self._conn = conn
        self._iid = iid
        self._obj = types.SimpleNamespace(id=_RVal(iid))

    @property
    def _rec(self):
        return self._conn._server.images[self._iid]

    def getId(self):
        return self._iid

    def getName(self):
        return self._rec["name"]

    def getSizeT(self):
        return int(self._rec["planes"].shape[0])

    def getSizeC(self):
        return int(self._rec["planes"].shape[1])

    def getSizeZ(self):
        return 1

    def getSizeY(self):
        return int(self._rec["planes"].shape[2])

    def getSizeX(self):
        return int(self._rec["planes"].shape[3])

    def getPrimaryPixels(self):
        self._conn._check_alive()
        return _FakePixels(self._rec)

    def listAnnotations(self, ns=None):
        self._conn._check_alive()
        for ann in list(self._rec["anns"]):
            if ns is None or ann.getNs() == ns:
                yield ann

    def linkAnnotation(self, ann):
        self._conn._check_alive()
        if getattr(ann, "_id", None) is None:
            ann._id = self._conn._server.new_id()
        self._rec["anns"].append(ann)

    def getParent(self):
        return _DatasetWrapper(self._conn, self._rec["dataset_id"])

    def getDetails(self):
        return _FakeDetails(self._rec["group"])

    def canAnnotate(self):
        return self._rec.get("can_annotate", True)


class _DatasetWrapper:
    def __init__(self, conn, did):
        self._conn = conn
        self._did = did

    def getId(self):
        return self._did

    def getName(self):
        return self._conn._server.datasets[self._did]["name"]

    def listChildren(self):
        self._conn._check_alive()
        for iid, rec in sorted(self._conn._server.images.items()):
            if rec["dataset_id"] == self._did:
                yield _ImageWrapper(self._conn, iid)

    def listAnnotations(self, ns=None):
        self._conn._check_alive()
        rec = self._conn._server.datasets[self._did]
        for ann in list(rec.setdefault("anns", [])):
            if ns is None or ann.getNs() == ns:
                yield ann

    def linkAnnotation(self, ann):
        self._conn._check_alive()
        if getattr(ann, "_id", None) is None:
            ann._id = self._conn._server.new_id()
        self._conn._server.datasets[self._did].setdefault(
            "anns", []).append(ann)


class _ProjectWrapper:
    def __init__(self, conn, pid):
        self._conn = conn
        self._pid = pid

    def getId(self):
        return self._pid

    def getName(self):
        return self._conn._server.projects[self._pid]["name"]

    def listChildren(self):
        self._conn._check_alive()
        for did, rec in sorted(self._conn._server.datasets.items()):
            if rec.get("project_id") == self._pid:
                yield _DatasetWrapper(self._conn, did)


class _FakeRoiService:
    def __init__(self, conn):
        self._conn = conn

    def findByImage(self, image_id, opts):
        self._conn._check_alive()
        rois = self._conn._server.images[image_id]["rois"]
        return types.SimpleNamespace(rois=list(rois))


class _FakeUpdateService:
    def __init__(self, conn):
        self._conn = conn

    def saveAndReturnObject(self, obj):
        self._conn._check_alive()
        server = self._conn._server
        if isinstance(obj, RoiI):
            obj.id = _RVal(server.new_id())
            iid = obj._image_obj.id.val
            server.images[iid]["rois"].append(obj)
            return obj
        if isinstance(obj, DatasetI):
            did = server.new_id()
            server.datasets[did] = {
                "name": obj._name.val if obj._name else "",
                "project_id": None}
            obj._id = did
            return obj
        if isinstance(obj, ProjectDatasetLinkI):
            server.datasets[obj._child._id]["project_id"] = obj._parent._id
            return obj
        raise TypeError(f"unsupported save: {type(obj)}")


class FakeBlitzGateway:
    _server: "FakeServer" = None  # installed by install()

    def __init__(self, username, password, host=None, port=None, secure=True):
        self._alive = False
        self.group_set = []  # setOmeroGroup calls, for assertions
        self.SERVICE_OPTS = types.SimpleNamespace(
            setOmeroGroup=self.group_set.append)

    def getGroupsMemberOf(self):
        self._check_alive()
        return [types.SimpleNamespace(getId=lambda gid=gid: gid,
                                      getName=lambda n=name: n)
                for gid, name in self._server.groups]

    def connect(self):
        server = self._server
        server.connects += 1
        if server.refuse_connect:
            return False
        self._alive = True
        server.live_gateways.append(self)
        return True

    def _check_alive(self):
        if not self._alive:
            raise RuntimeError("Ice.ConnectionLostException (fake)")

    def close(self):
        self._alive = False

    # -- objects ----------------------------------------------------------
    def getObject(self, kind, oid):
        self._check_alive()
        server = self._server
        if kind == "Image":
            return (_ImageWrapper(self, oid)
                    if oid in server.images else None)
        if kind == "Dataset":
            return (_DatasetWrapper(self, oid)
                    if oid in server.datasets else None)
        if kind == "Project":
            return (_ProjectWrapper(self, oid)
                    if oid in server.projects else None)
        raise TypeError(f"unsupported kind {kind}")

    def getObjects(self, kind):
        self._check_alive()
        if kind == "Project":
            return [_ProjectWrapper(self, pid)
                    for pid in sorted(self._server.projects)]
        raise TypeError(f"unsupported kind {kind}")

    def createImageFromNumpySeq(self, planes, name, sizeZ=1, sizeC=1,
                                sizeT=1, dataset=None):
        self._check_alive()
        # omero-py consumes planes z-major, then c, then t
        stack = None
        for z in range(sizeZ):
            for c in range(sizeC):
                for t in range(sizeT):
                    plane = np.asarray(next(planes))
                    if stack is None:
                        stack = np.zeros((sizeT, sizeC) + plane.shape,
                                         plane.dtype)
                    stack[t, c] = plane
        iid = self._server.new_id()
        self._server.images[iid] = {
            "name": name, "planes": stack,
            "dataset_id": dataset.getId() if dataset else -1,
            "group": self._server.default_group,
            "anns": [], "rois": []}
        return _ImageWrapper(self, iid)

    def getRoiService(self):
        return _FakeRoiService(self)

    def getUpdateService(self):
        return _FakeUpdateService(self)

    def deleteObjects(self, kind, ids, wait=True):
        self._check_alive()
        server = self._server
        if kind == "Roi":
            for rec in server.images.values():
                rec["rois"] = [r for r in rec["rois"]
                               if r.id.val not in ids]
        elif kind == "Annotation":
            for rec in server.images.values():
                rec["anns"] = [a for a in rec["anns"]
                               if a.getId() not in ids]
            for rec in server.datasets.values():
                rec["anns"] = [a for a in rec.get("anns", [])
                               if a.getId() not in ids]
        else:
            raise TypeError(f"unsupported delete kind {kind}")

    def createFileAnnfromLocalFile(self, path, mimetype=None, ns=None):
        self._check_alive()
        path = Path(path)
        return FileAnnotationWrapper(conn=self, name=path.name, ns=ns,
                                     content=path.read_bytes())


class FakeServer:
    """Shared in-memory server state behind every FakeBlitzGateway."""

    def __init__(self):
        self.projects = {}
        self.datasets = {}
        self.images = {}
        self._next = 100
        self.connects = 0
        self.refuse_connect = False
        self.default_group = 0
        self.groups = [(0, "lab-alpha"), (7, "lab-beta")]
        self.live_gateways = []

    def new_id(self):
        self._next += 1
        return self._next

    def create_project(self, name):
        pid = self.new_id()
        self.projects[pid] = {"name": name}
        return pid

    def kill_connections(self):
        """Simulate a server-side timeout: every live gateway starts raising
        until a fresh ``connect()`` (drives OmeroStore's reconnect-retry)."""
        for gw in self.live_gateways:
            gw._alive = False
        self.live_gateways.clear()

    def set_group(self, image_id, group):
        self.images[image_id]["group"] = group


def install() -> FakeServer:
    """Register the fake omero modules in sys.modules; returns the server.

    Idempotent: repeated calls return a FRESH server bound to the same
    module objects, so each test gets clean state.
    """
    server = FakeServer()
    FakeBlitzGateway._server = server

    omero = types.ModuleType("omero")
    gateway = types.ModuleType("omero.gateway")
    gateway.BlitzGateway = FakeBlitzGateway
    gateway.MapAnnotationWrapper = MapAnnotationWrapper
    gateway.FileAnnotationWrapper = FileAnnotationWrapper
    model = types.ModuleType("omero.model")
    model.PolygonI = PolygonI
    model.RoiI = RoiI
    model.DatasetI = DatasetI
    model.ProjectI = ProjectI
    model.ProjectDatasetLinkI = ProjectDatasetLinkI
    rtypes = types.ModuleType("omero.rtypes")
    rtypes.rint = _RVal
    rtypes.rstring = _RVal
    rtypes.rdouble = _RVal
    constants = types.ModuleType("omero.constants")
    metadata = types.ModuleType("omero.constants.metadata")
    metadata.NSCLIENTMAPANNOTATION = NSCLIENTMAPANNOTATION
    constants.metadata = metadata
    omero.gateway = gateway
    omero.model = model
    omero.rtypes = rtypes
    omero.constants = constants

    sys.modules["omero"] = omero
    sys.modules["omero.gateway"] = gateway
    sys.modules["omero.model"] = model
    sys.modules["omero.rtypes"] = rtypes
    sys.modules["omero.constants"] = constants
    sys.modules["omero.constants.metadata"] = metadata
    return server
