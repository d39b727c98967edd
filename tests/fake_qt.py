"""Headless in-memory fake of the PyQt5 surface used by the GUI.

PyQt5 is not installed in this environment (reference requirement:
requirements.yml pyqt 5.12); ``install()`` registers fake ``PyQt5`` modules
in ``sys.modules`` so the REAL ``microbeseg_tpu.gui.app`` code builds its
widget tree, wires workers, and drives the crop-review flow in tests.
Signals are synchronous callback lists; QThread.start() runs the worker
inline (deterministic single-threaded tests).
"""

from __future__ import annotations

import sys
import types


class BoundSignal:
    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def disconnect(self, fn=None):
        if fn is None:
            self._slots.clear()
        else:
            self._slots.remove(fn)

    def emit(self, *args):
        for fn in list(self._slots):
            fn(*args)


class pyqtSignal:  # noqa: N801 - mirrors the PyQt5 name
    def __init__(self, *types):
        self._types = types

    def __set_name__(self, owner, name):
        self._name = name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        key = "_bound_" + self._name
        if key not in obj.__dict__:
            obj.__dict__[key] = BoundSignal()
        return obj.__dict__[key]


class QObject:
    def __init__(self, parent=None):
        self._parent = parent

    def moveToThread(self, thread):
        pass


class QThread(QObject):
    def __init__(self):
        super().__init__()
        self.started = BoundSignal()

    def start(self):
        self.started.emit()  # synchronous: the worker runs inline

    def quit(self):
        pass

    def wait(self):
        pass


class _Qt:
    AlignCenter = 0x84
    white = "white"
    Key_Space = 0x20


class QColor:
    def __init__(self, *args):
        self.args = args


class QPalette:
    Window = WindowText = Base = Text = Button = ButtonText = Highlight = None

    def setColor(self, role, color):
        pass


class QImage:
    Format_Grayscale8 = 24
    Format_RGB888 = 13

    def __init__(self, data, w, h, stride, fmt):
        self.w, self.h = w, h

    def copy(self):
        return self


class QPixmap:
    def __init__(self, image=None):
        self.image = image

    @staticmethod
    def fromImage(img):
        return QPixmap(img)


class QKeySequence:
    def __init__(self, seq):
        self.seq = seq


class QShortcut:
    registry = []

    def __init__(self, seq, parent, activated=None):
        self.seq = getattr(seq, "seq", seq)
        self.activated = activated
        QShortcut.registry.append(self)

    @classmethod
    def trigger(cls, seq):
        for sc in cls.registry:
            if sc.seq == seq and sc.activated:
                sc.activated()


class _Widget(QObject):
    def __init__(self, *a, **k):
        super().__init__()
        self._visible = False

    def show(self):
        self._visible = True

    def resize(self, w, h):
        pass

    def setMinimumSize(self, w, h):
        pass

    def setAlignment(self, a):
        pass

    def setToolTip(self, t):
        self._tooltip = t


class QWidget(_Widget):
    pass


class _Layout:
    def __init__(self, parent=None):
        self.items = []
        if parent is not None:
            parent._layout = self

    def addWidget(self, w, *pos):
        self.items.append(w)

    def addLayout(self, l, *pos):
        self.items.append(l)


class QGridLayout(_Layout):
    """Tracks cell occupancy: real Qt silently stacks two widgets added to
    the same grid cell (rendering both unusable), which headless tests can't
    see — so the fake asserts instead (caught a real overlap in round 2)."""

    def __init__(self, parent=None):
        super().__init__(parent)
        self._cells = {}

    def addWidget(self, w, *pos):
        super().addWidget(w, *pos)
        if len(pos) >= 2:
            row, col = pos[0], pos[1]
            rspan = pos[2] if len(pos) >= 4 else 1
            cspan = pos[3] if len(pos) >= 4 else 1
            for r in range(row, row + rspan):
                for c in range(col, col + cspan):
                    prev = self._cells.get((r, c))
                    assert prev is None, (
                        f"two widgets in grid cell ({r}, {c}): "
                        f"{type(prev).__name__} and {type(w).__name__}")
                    self._cells[(r, c)] = w


class QHBoxLayout(_Layout):
    pass


class QVBoxLayout(_Layout):
    pass


class QLabel(_Widget):
    def __init__(self, text=""):
        super().__init__()
        self._text = text
        self._pixmap = None

    def setText(self, t):
        self._text = t

    def text(self):
        return self._text

    def setPixmap(self, p):
        self._pixmap = p


class QLineEdit(_Widget):
    Normal, NoEcho, Password = 0, 1, 2

    def __init__(self, text=""):
        super().__init__()
        self._text = text
        self._echo = 0

    def setText(self, t):
        self._text = t

    def text(self):
        return self._text

    def setEchoMode(self, mode):
        self._echo = mode

    def setPlaceholderText(self, t):
        self._placeholder = t


class QCheckBox(_Widget):
    def __init__(self, text=""):
        super().__init__()
        self._text = text
        self._checked = False
        self.stateChanged = BoundSignal()

    def setChecked(self, v):
        self._checked = bool(v)
        self.stateChanged.emit(2 if v else 0)

    def isChecked(self):
        return self._checked

    def text(self):
        return self._text


class QSpinBox(_Widget):
    def __init__(self):
        super().__init__()
        self._value = 0
        self._min, self._max = 0, 99

    def setRange(self, lo, hi):
        self._min, self._max = lo, hi
        self._value = max(self._value, lo)

    def setValue(self, v):
        self._value = v

    def value(self):
        return self._value


class QDoubleSpinBox(_Widget):
    def __init__(self):
        super().__init__()
        self._value = 0.0
        self._min, self._max = 0.0, 99.0

    def setRange(self, lo, hi):
        self._min, self._max = lo, hi
        self._value = max(self._value, lo)

    def setSingleStep(self, s):
        self._step = s

    def setDecimals(self, d):
        self._decimals = d

    def setValue(self, v):
        self._value = float(v)

    def value(self):
        return self._value


class QListWidgetItem:
    def __init__(self, text):
        self._text = text
        self._selected = False

    def text(self):
        return self._text

    def setSelected(self, v):
        self._selected = bool(v)

    def isSelected(self):
        return self._selected


class QListWidget(_Widget):
    ExtendedSelection = 3
    MultiSelection = 2

    def __init__(self):
        super().__init__()
        self._items = []
        self.itemSelectionChanged = BoundSignal()

    def setSelectionMode(self, mode):
        self._selection_mode = mode

    def addItem(self, text):
        self._items.append(QListWidgetItem(text)
                           if isinstance(text, str) else text)

    def addItems(self, items):
        for t in items:
            self.addItem(t)

    def clear(self):
        self._items = []

    def count(self):
        return len(self._items)

    def item(self, i):
        return self._items[i]

    def selectedItems(self):
        return [it for it in self._items if it.isSelected()]


class QComboBox(_Widget):
    def __init__(self):
        super().__init__()
        self._items = []
        self._idx = -1
        self.currentIndexChanged = BoundSignal()

    def addItems(self, items):
        self._items.extend(items)
        if self._idx < 0 and self._items:
            self._idx = 0

    def addItem(self, item):
        self.addItems([item])

    def clear(self):
        self._items = []
        self._idx = -1

    def currentText(self):
        return self._items[self._idx] if self._idx >= 0 else ""

    def setCurrentIndex(self, i):
        self._idx = i
        self.currentIndexChanged.emit(i)

    def currentIndex(self):
        return self._idx

    def count(self):
        return len(self._items)

    def itemText(self, i):
        return self._items[i]


class QPushButton(_Widget):
    def __init__(self, text=""):
        super().__init__()
        self._text = text
        self.clicked = BoundSignal()

    def click(self):
        self.clicked.emit()

    def text(self):
        return self._text


class QTextEdit(_Widget):
    def __init__(self):
        super().__init__()
        self._lines = []

    def setReadOnly(self, ro):
        pass

    def append(self, text):
        self._lines.append(text)

    def toPlainText(self):
        return "\n".join(self._lines)


class QProgressBar(_Widget):
    def __init__(self):
        super().__init__()
        self._value = 0

    def setValue(self, v):
        self._value = v

    def value(self):
        return self._value


class _StatusBar:
    def __init__(self):
        self.message = ""

    def showMessage(self, m):
        self.message = m

    def currentMessage(self):
        return self.message


class QMainWindow(_Widget):
    def __init__(self):
        super().__init__()
        self._status = _StatusBar()
        self._central = None

    def setWindowTitle(self, t):
        self._title = t

    def setCentralWidget(self, w):
        self._central = w

    def statusBar(self):
        return self._status


class QMessageBox:
    shown = []

    @staticmethod
    def information(parent, title, text):
        QMessageBox.shown.append((title, text))


class QFileDialog:
    next_files = []

    @staticmethod
    def getOpenFileNames(parent=None, caption="", directory="", filter=""):
        files = QFileDialog.next_files
        QFileDialog.next_files = []
        return [str(f) for f in files], filter


class QApplication(_Widget):
    _instance = None

    def __init__(self, argv=None):
        super().__init__()
        QApplication._instance = self

    @staticmethod
    def instance():
        return QApplication._instance

    def setStyle(self, s):
        pass

    def setPalette(self, p):
        pass

    def exec_(self):
        return 0


def install() -> None:
    """Register fake PyQt5 modules in sys.modules (idempotent); resets the
    shortcut registry and message-box log for a clean test."""
    QShortcut.registry = []
    QMessageBox.shown = []

    pyqt5 = types.ModuleType("PyQt5")
    qtcore = types.ModuleType("PyQt5.QtCore")
    qtcore.QObject = QObject
    qtcore.Qt = _Qt
    qtcore.QThread = QThread
    qtcore.pyqtSignal = pyqtSignal
    qtgui = types.ModuleType("PyQt5.QtGui")
    qtgui.QColor = QColor
    qtgui.QImage = QImage
    qtgui.QKeySequence = QKeySequence
    qtgui.QPalette = QPalette
    qtgui.QPixmap = QPixmap
    qtwidgets = types.ModuleType("PyQt5.QtWidgets")
    for cls in (QApplication, QCheckBox, QComboBox, QDoubleSpinBox,
                QFileDialog, QGridLayout, QHBoxLayout, QLabel, QLineEdit,
                QListWidget, QListWidgetItem, QMainWindow, QMessageBox,
                QProgressBar, QPushButton, QShortcut, QSpinBox, QTextEdit,
                QVBoxLayout, QWidget):
        setattr(qtwidgets, cls.__name__, cls)
    pyqt5.QtCore = qtcore
    pyqt5.QtGui = qtgui
    pyqt5.QtWidgets = qtwidgets
    sys.modules["PyQt5"] = pyqt5
    sys.modules["PyQt5.QtCore"] = qtcore
    sys.modules["PyQt5.QtGui"] = qtgui
    sys.modules["PyQt5.QtWidgets"] = qtwidgets
