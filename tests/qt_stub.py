"""Functional PyQt6 stand-ins for behavioral GUI tests.

PyQt6 cannot be installed in this image (no network egress — the attempt
is recorded in ROADMAP.md), so the real-Qt smoke path is unavailable.
These stubs go one level deeper than the import-only metaclass mocks in
``test_gui_imports.py``: geometry types carry real values, signals really
connect/emit, scenes really hold items, and a recording painter captures
draw calls — enough to execute ``editor_scene.py``'s drop/move/paint
branches against the real ``CircuitEditorModel`` and assert on circuit
mutations and draw output.
"""

from __future__ import annotations

import sys
import types


# -- signals ----------------------------------------------------------------

class _BoundSignal:
    def __init__(self):
        self._subs = []

    def connect(self, fn):
        self._subs.append(fn)

    def disconnect(self, fn=None):
        if fn is None:
            self._subs = []
        else:
            self._subs.remove(fn)

    def emit(self, *a):
        for fn in list(self._subs):
            fn(*a)


class pyqtSignal:  # noqa: N801 - matches the Qt name
    def __init__(self, *a, **k):
        self._name = None

    def __set_name__(self, owner, name):
        self._name = "_sig_" + name

    def __get__(self, obj, owner):
        if obj is None:
            return self
        sig = obj.__dict__.get(self._name)
        if sig is None:
            sig = _BoundSignal()
            obj.__dict__[self._name] = sig
        return sig


# -- geometry ---------------------------------------------------------------

class QPointF:
    def __init__(self, x=0.0, y=0.0):
        self._x, self._y = float(x), float(y)

    def x(self):
        return self._x

    def y(self):
        return self._y

    def __add__(self, other):
        return QPointF(self._x + other.x(), self._y + other.y())

    def __eq__(self, other):
        return (isinstance(other, QPointF)
                and self._x == other.x() and self._y == other.y())

    def __ne__(self, other):
        return not self.__eq__(other)

    def __hash__(self):
        return hash((self._x, self._y))

    def __repr__(self):
        return f"QPointF({self._x}, {self._y})"


class QRectF:
    def __init__(self, x=0.0, y=0.0, w=0.0, h=0.0):
        self._x, self._y, self._w, self._h = map(float, (x, y, w, h))

    def x(self):
        return self._x

    def y(self):
        return self._y

    def width(self):
        return self._w

    def height(self):
        return self._h

    def right(self):
        return self._x + self._w

    def bottom(self):
        return self._y + self._h

    def center(self):
        return QPointF(self._x + self._w / 2, self._y + self._h / 2)


# -- paint plumbing ---------------------------------------------------------

class QColor:
    def __init__(self, *a):
        self.spec = a

    def darker(self, *a):
        return self

    def __repr__(self):
        return f"QColor{self.spec}"


class QPen:
    def __init__(self, *a):
        self.args = a


class QBrush:
    def __init__(self, *a):
        self.args = a


class QFont:
    class Weight:
        Bold = 75

    def __init__(self, *a):
        self.args = a


class QPainter:
    """Records every draw call for assertions."""

    class RenderHint:
        Antialiasing = 1

    def __init__(self):
        self.calls = []

    def setRenderHint(self, *a):
        self.calls.append(("hint", a))

    def setPen(self, *a):
        self.calls.append(("pen", a))

    def setBrush(self, *a):
        self.calls.append(("brush", a))

    def setFont(self, *a):
        self.calls.append(("font", a))

    def drawLine(self, *a):
        self.calls.append(("line", a))

    def drawEllipse(self, *a):
        self.calls.append(("ellipse", a))

    def drawArc(self, *a):
        self.calls.append(("arc", a))

    def drawText(self, *a):
        self.calls.append(("text", a))

    def count(self, kind):
        return sum(1 for c in self.calls if c[0] == kind)


# -- enums ------------------------------------------------------------------

class Qt:
    class PenStyle:
        SolidLine = 0
        DashLine = 1
        NoPen = 2

    class BrushStyle:
        NoBrush = 0

    class AlignmentFlag:
        AlignCenter = 0x84

    class KeyboardModifier:
        ControlModifier = 0x04000000

    class Key:
        Key_Delete = 0x01000007
        Key_Backspace = 0x01000003
        Key_Z = 0x5A
        Key_Y = 0x59
        Key_A = 0x41
        Key_0 = 0x30


# -- items / scene / view ---------------------------------------------------

class QGraphicsItem:
    class GraphicsItemFlag:
        ItemIsMovable = 1
        ItemIsSelectable = 2


class _ItemBase:
    def __init__(self):
        self._data = {}
        self._selected = False
        self._z = 0

    def setData(self, key, value):
        self._data[key] = value

    def data(self, key):
        return self._data.get(key)

    def setZValue(self, z):
        self._z = z

    def setSelected(self, sel):
        self._selected = bool(sel)

    def isSelected(self):
        return self._selected


class QGraphicsRectItem(_ItemBase):
    def __init__(self, x=0.0, y=0.0, w=0.0, h=0.0):
        super().__init__()
        self._rect = QRectF(x, y, w, h)
        self._pos = QPointF(0.0, 0.0)
        self.flags = set()
        self.brush = None
        self.pen = None

    def rect(self):
        return self._rect

    def setPos(self, x, y=None):
        self._pos = x if isinstance(x, QPointF) else QPointF(x, y)

    def pos(self):
        return self._pos

    def setFlag(self, flag, on=True):
        if on:
            self.flags.add(flag)

    def setBrush(self, b):
        self.brush = b

    def setPen(self, p):
        self.pen = p

    def paint(self, painter, option, widget=None):
        pass

    def mousePressEvent(self, event):
        pass

    def mouseReleaseEvent(self, event):
        pass


class _TextItem(_ItemBase):
    def __init__(self, text):
        super().__init__()
        self.text = text
        self._pos = QPointF(0.0, 0.0)

    def setDefaultTextColor(self, c):
        self.color = c

    def setPos(self, x, y=None):
        self._pos = x if isinstance(x, QPointF) else QPointF(x, y)


class _ShapeItem(_ItemBase):
    def __init__(self, kind, args):
        super().__init__()
        self.kind = kind
        self.args = args


class QGraphicsScene:
    def __init__(self, parent=None):
        self._items = []
        self._scene_rect = None
        self.selectionChanged = _BoundSignal()
        self._views = []
        self._test_item_at = None

    # construction
    def addItem(self, item):
        self._items.append(item)

    def addLine(self, *a):
        item = _ShapeItem("line", a)
        self._items.append(item)
        return item

    def addText(self, text, font=None):
        item = _TextItem(text)
        self._items.append(item)
        return item

    def addRect(self, *a):
        item = _ShapeItem("rect", a)
        self._items.append(item)
        return item

    def removeItem(self, item):
        self._items.remove(item)

    def clear(self):
        self._items = []

    def setSceneRect(self, *a):
        self._scene_rect = a

    # queries
    def items(self):
        return list(self._items)

    def selectedItems(self):
        return [it for it in self._items
                if getattr(it, "_selected", False)]

    def views(self):
        return list(self._views)

    def itemAt(self, pos, transform=None):
        return self._test_item_at

    # event defaults
    def mousePressEvent(self, event):
        pass

    def mouseDoubleClickEvent(self, event):
        pass

    def keyPressEvent(self, event):
        pass


class QGraphicsView:
    def __init__(self, scene=None, parent=None):
        self._scene = scene
        if scene is not None:
            scene._views.append(self)
        self.scaled = []

    class DragMode:
        RubberBandDrag = 1

    def scene(self):
        return self._scene

    def setAcceptDrops(self, on):
        pass

    def setRenderHint(self, *a):
        pass

    def setDragMode(self, *a):
        pass

    def scale(self, sx, sy):
        self.scaled.append((sx, sy))

    def resetTransform(self):
        self.scaled.append("reset")

    def transform(self):
        return None

    def wheelEvent(self, event):
        pass

    def keyPressEvent(self, event):
        pass


# -- dialogs ----------------------------------------------------------------

class QDialog:
    class DialogCode:
        Accepted = 1
        Rejected = 0

    _exec_result = 1  # tests can override per-class/instance

    def __init__(self, parent=None):
        pass

    def setWindowTitle(self, t):
        self.title = t

    def accept(self):
        pass

    def reject(self):
        pass

    def exec(self):
        return self._exec_result


class QFormLayout:
    def __init__(self, parent=None):
        self.rows = []

    def addRow(self, *a):
        self.rows.append(a)


class QSpinBox:
    def __init__(self):
        self._value = 0

    def setRange(self, lo, hi):
        self.range = (lo, hi)

    def setValue(self, v):
        self._value = int(v)

    def value(self):
        return self._value


class QDialogButtonBox:
    class StandardButton:
        Ok = 1
        Cancel = 2

    def __init__(self, *a):
        self.accepted = _BoundSignal()
        self.rejected = _BoundSignal()


# -- installer --------------------------------------------------------------

_CORE = {"QPointF": QPointF, "QRectF": QRectF, "Qt": Qt,
         "pyqtSignal": pyqtSignal}
_GUI = {"QBrush": QBrush, "QColor": QColor, "QFont": QFont,
        "QPainter": QPainter, "QPen": QPen}
_WIDGETS = {"QDialog": QDialog, "QDialogButtonBox": QDialogButtonBox,
            "QFormLayout": QFormLayout, "QGraphicsItem": QGraphicsItem,
            "QGraphicsRectItem": QGraphicsRectItem,
            "QGraphicsScene": QGraphicsScene,
            "QGraphicsView": QGraphicsView, "QSpinBox": QSpinBox}


def install(monkeypatch):
    """Install the functional stubs as PyQt6 modules (monkeypatch-scoped)
    and purge any previously imported gui modules so they re-import
    against the stubs. Returns True if stubs were installed, False when
    real PyQt6 exists (then tests should run against the real thing)."""
    try:
        import PyQt6  # noqa: F401

        return False
    except ImportError:
        pass
    pkg = types.ModuleType("PyQt6")
    core = types.ModuleType("PyQt6.QtCore")
    gui = types.ModuleType("PyQt6.QtGui")
    widgets = types.ModuleType("PyQt6.QtWidgets")
    for mod, names in ((core, _CORE), (gui, _GUI), (widgets, _WIDGETS)):
        for k, v in names.items():
            setattr(mod, k, v)
    pkg.QtCore, pkg.QtGui, pkg.QtWidgets = core, gui, widgets
    for name, mod in (("PyQt6", pkg), ("PyQt6.QtCore", core),
                      ("PyQt6.QtGui", gui), ("PyQt6.QtWidgets", widgets)):
        monkeypatch.setitem(sys.modules, name, mod)
    for name in list(sys.modules):
        if name.startswith("quantum_simulator_tpu.gui"):
            del sys.modules[name]
    return True
