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
        import inspect

        for fn in list(self._subs):
            # Qt drops trailing signal args the slot doesn't accept.
            try:
                sig = inspect.signature(fn)
                params = list(sig.parameters.values())
                if any(p.kind == p.VAR_POSITIONAL for p in params):
                    fn(*a)
                    continue
                n = sum(p.kind in (p.POSITIONAL_ONLY,
                                   p.POSITIONAL_OR_KEYWORD)
                        for p in params)
                fn(*a[:n])
            except (ValueError, TypeError) as exc:
                if "signature" in str(exc):
                    fn(*a)
                else:
                    raise


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

class QPoint:
    def __init__(self, x=0, y=0):
        self._x, self._y = int(x), int(y)

    def x(self):
        return self._x

    def y(self):
        return self._y

    def __sub__(self, other):
        return QPoint(self._x - other.x(), self._y - other.y())

    def manhattanLength(self):
        return abs(self._x) + abs(self._y)


class QSize:
    def __init__(self, w=0, h=0):
        self._w, self._h = int(w), int(h)

    def width(self):
        return self._w

    def height(self):
        return self._h

    def expandedTo(self, other):
        return QSize(max(self._w, other.width()),
                     max(self._h, other.height()))

    def __add__(self, other):
        return QSize(self._w + other.width(), self._h + other.height())


class QRect:
    def __init__(self, *a):
        if len(a) == 2:  # (QPoint, QSize)
            p, s = a
            a = (p.x(), p.y(), s.width(), s.height())
        x, y, w, h = a or (0, 0, 0, 0)
        self._x, self._y, self._w, self._h = x, y, w, h

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

    class MouseButton:
        NoButton = 0
        LeftButton = 1

    class DropAction:
        CopyAction = 1

    class DockWidgetArea:
        LeftDockWidgetArea = 1
        RightDockWidgetArea = 2

    class ItemFlag:
        NoItemFlags = 0
        ItemIsSelectable = 1
        ItemIsEditable = 2
        ItemIsEnabled = 32


Qt.Orientation = type("Orientation", (), {
    "Horizontal": 1, "Vertical": 2,
    "__init__": lambda self, v=0: setattr(self, "v", v)})


# -- drag / mime / timers / actions ------------------------------------------

class QMimeData:
    def __init__(self):
        self._data = {}
        self._text = ""

    def setData(self, fmt, payload):
        self._data[fmt] = payload

    def data(self, fmt):
        return self._data.get(fmt, b"")

    def hasFormat(self, fmt):
        return fmt in self._data

    def setText(self, t):
        self._text = t

    def text(self):
        return self._text


class QDrag:
    executed = []  # (source, mime) per exec, for assertions

    def __init__(self, source):
        self.source = source
        self._mime = None

    def setMimeData(self, m):
        self._mime = m

    def setPixmap(self, p):
        self.pixmap = p

    def mimeData(self):
        return self._mime

    def exec(self, *a):
        QDrag.executed.append((self.source, self._mime))
        return 1


class QTimer:
    started = []  # live timers, for tests to pump manually

    def __init__(self, parent=None):
        self.timeout = _BoundSignal()
        self._interval = 0
        self._active = False

    def setInterval(self, ms):
        self._interval = ms

    def start(self, *a):
        self._active = True
        QTimer.started.append(self)

    def stop(self):
        self._active = False

    def isActive(self):
        return self._active

    def fire(self):  # test helper: one tick
        self.timeout.emit()


class QAction:
    def __init__(self, text="", parent=None):
        self._text = text
        self.triggered = _BoundSignal()
        self.shortcut = None

    def setShortcut(self, s):
        self.shortcut = s

    def setText(self, t):
        self._text = t

    def text(self):
        return self._text


class QKeySequence:
    def __init__(self, s=""):
        self.s = s


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
        if parent is not None and hasattr(parent, "setLayout"):
            parent.setLayout(self)

    def addRow(self, *a):
        self.rows.append(a)

    def rowCount(self):
        return len(self.rows)

    def removeRow(self, i):
        self.rows.pop(i)


class QSpinBox:
    def __init__(self, parent=None):
        self._value = 0
        self.valueChanged = _BoundSignal()

    def setRange(self, lo, hi):
        self.range = (lo, hi)

    def setValue(self, v):
        self._value = int(v)
        self.valueChanged.emit(self._value)

    def value(self):
        return self._value

    def setSuffix(self, s):
        self.suffix = s

    def setSingleStep(self, s):
        self.step = s


class QDialogButtonBox:
    class StandardButton:
        Ok = 1
        Cancel = 2

    def __init__(self, *a):
        self.accepted = _BoundSignal()
        self.rejected = _BoundSignal()


# -- widgets ------------------------------------------------------------------

class QWidget:
    def __init__(self, parent=None):
        self._parent = parent
        self._layout = None
        self._deleted = False
        self._fixed = None
        self._tooltip = ""
        self._style = ""
        self._visible = True

    def setLayout(self, layout):
        self._layout = layout

    def layout(self):
        return self._layout

    def deleteLater(self):
        self._deleted = True

    def setToolTip(self, t):
        self._tooltip = t

    def setFixedSize(self, w, h):
        self._fixed = QSize(w, h)

    def setFixedWidth(self, w):
        self._fixed = QSize(w, (self._fixed.height() if self._fixed else 0))

    def sizeHint(self):
        return self._fixed or QSize(40, 20)

    def minimumSize(self):
        return self.sizeHint()

    def setGeometry(self, rect):
        self.geometry = rect

    def setStyleSheet(self, s):
        self._style = s

    def setContentsMargins(self, *a):
        pass

    def grab(self):
        return None

    def show(self):
        self._visible = True

    def close(self):
        self._visible = False

    def width(self):
        return (self._fixed or QSize(800, 600)).width()

    def height(self):
        return (self._fixed or QSize(800, 600)).height()

    def resize(self, w, h):
        self._fixed = QSize(w, h)

    def setWindowTitle(self, t):
        self.title = t

    def mousePressEvent(self, event):
        pass

    def mouseMoveEvent(self, event):
        pass


class _Layout:
    """Shared functional layout: records children, exposes them."""

    def __init__(self, parent=None):
        self._children = []  # ("widget"|"layout"|"stretch", obj)
        if parent is not None and hasattr(parent, "setLayout"):
            parent.setLayout(self)

    def addWidget(self, w, *a, **k):
        self._children.append(("widget", w))

    def addLayout(self, lay, *a):
        self._children.append(("layout", lay))

    def insertLayout(self, index, lay, *a):
        self._children.insert(index, ("layout", lay))

    def insertWidget(self, index, w, *a):
        self._children.insert(index, ("widget", w))

    def addStretch(self, *a):
        self._children.append(("stretch", None))

    def setContentsMargins(self, *a):
        pass

    def setSpacing(self, *a):
        pass

    def widgets(self):
        return [obj for kind, obj in self._children if kind == "widget"]


class QVBoxLayout(_Layout):
    pass


class QHBoxLayout(_Layout):
    pass


class QGridLayout(_Layout):
    def __init__(self, parent=None):
        super().__init__(parent)
        self.cells = {}

    def addWidget(self, w, r=0, c=0, *a):
        super().addWidget(w)
        self.cells[(r, c)] = w


class _LayoutItem:
    """QLayoutItem stand-in wrapping a widget."""

    def __init__(self, widget):
        self.widget = widget

    def sizeHint(self):
        return self.widget.sizeHint()

    def minimumSize(self):
        return self.widget.minimumSize()

    def setGeometry(self, rect):
        self.widget.setGeometry(rect)


class _Margins:
    def __init__(self, l=0, t=0, r=0, b=0):
        self._l, self._t, self._r, self._b = l, t, r, b

    def left(self):
        return self._l

    def right(self):
        return self._r

    def top(self):
        return self._t

    def bottom(self):
        return self._b


class QLayout:
    """Base for custom layouts (FlowLayout): addWidget wraps into items
    and routes through the subclass's addItem."""

    def __init__(self, parent=None):
        self._margins = _Margins()
        self._geometry = None
        if parent is not None and hasattr(parent, "setLayout"):
            parent.setLayout(self)

    def setContentsMargins(self, l, t, r, b):
        self._margins = _Margins(l, t, r, b)

    def contentsMargins(self):
        return self._margins

    def addWidget(self, w):
        self.addItem(_LayoutItem(w))

    def setGeometry(self, rect):
        self._geometry = rect


class QLabel(QWidget):
    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self._text = text

    def setText(self, t):
        self._text = str(t)

    def text(self):
        return self._text


class QLineEdit(QWidget):
    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self._text = text
        self.textChanged = _BoundSignal()

    def setText(self, t):
        self._text = str(t)
        self.textChanged.emit(self._text)

    def text(self):
        return self._text


class QPushButton(QWidget):
    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self._text = text
        self.clicked = _BoundSignal()

    def text(self):
        return self._text

    def setText(self, t):
        self._text = t

    def click(self):
        self.clicked.emit(False)


class QCheckBox(QWidget):
    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self._text = text
        self._checked = False
        self.stateChanged = _BoundSignal()
        self.toggled = _BoundSignal()

    def setChecked(self, on):
        self._checked = bool(on)
        self.stateChanged.emit(2 if on else 0)
        self.toggled.emit(self._checked)

    def isChecked(self):
        return self._checked

    def text(self):
        return self._text


class QComboBox(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._items = []  # (text, data)
        self._index = 0
        self.currentIndexChanged = _BoundSignal()
        self.currentTextChanged = _BoundSignal()

    def addItem(self, text, data=None):
        self._items.append((text, data))

    def addItems(self, texts):
        for t in texts:
            self.addItem(t)

    def count(self):
        return len(self._items)

    def currentIndex(self):
        return self._index

    def setCurrentIndex(self, i):
        self._index = int(i)
        self.currentIndexChanged.emit(self._index)
        self.currentTextChanged.emit(self.currentText())

    def setCurrentText(self, text):
        for i, (t, _) in enumerate(self._items):
            if t == text:
                self.setCurrentIndex(i)
                return

    def currentText(self):
        return self._items[self._index][0] if self._items else ""

    def currentData(self):
        return self._items[self._index][1] if self._items else None

    def itemText(self, i):
        return self._items[i][0]


class QDoubleSpinBox(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._value = 0.0
        self.valueChanged = _BoundSignal()

    def setRange(self, lo, hi):
        self.range = (lo, hi)

    def setDecimals(self, d):
        self.decimals = d

    def setSingleStep(self, s):
        self.step = s

    def setValue(self, v):
        self._value = float(v)
        self.valueChanged.emit(self._value)

    def value(self):
        return self._value

    def setSuffix(self, s):
        self.suffix = s


class QSlider(QWidget):
    def __init__(self, *a, parent=None):
        super().__init__(parent)
        self._value = 0
        self.valueChanged = _BoundSignal()

    def setRange(self, lo, hi):
        self.range = (lo, hi)

    def setMaximum(self, hi):
        self.range = (0, hi)

    def setValue(self, v):
        self._value = int(v)
        self.valueChanged.emit(self._value)

    def value(self):
        return self._value


class QGroupBox(QWidget):
    def __init__(self, title="", parent=None):
        super().__init__(parent)
        self.title = title


class QToolBox(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._pages = []  # (widget, title)

    def addItem(self, w, title):
        self._pages.append((w, title))

    def count(self):
        return len(self._pages)

    def widget(self, i):
        return self._pages[i][0]

    def itemText(self, i):
        return self._pages[i][1]

    def removeItem(self, i):
        self._pages.pop(i)


class QTabWidget(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._tabs = []  # (widget, name)
        self._current = 0

    def addTab(self, w, name):
        self._tabs.append((w, name))

    def setCurrentWidget(self, w):
        for i, (tw, _) in enumerate(self._tabs):
            if tw is w:
                self._current = i

    def currentWidget(self):
        return self._tabs[self._current][0] if self._tabs else None

    def count(self):
        return len(self._tabs)

    def widget(self, i):
        return self._tabs[i][0]

    def tabText(self, i):
        return self._tabs[i][1]


class QTableWidgetItem:
    def __init__(self, text=""):
        self._text = str(text)
        self._flags = 0
        self._background = None
        self._foreground = None
        self._alignment = 0

    def text(self):
        return self._text

    def setText(self, t):
        self._text = str(t)

    def setFlags(self, flags):
        self._flags = flags

    def flags(self):
        return self._flags

    def setBackground(self, b):
        self._background = b

    def setForeground(self, f):
        self._foreground = f

    def setTextAlignment(self, a):
        self._alignment = a


class QTableWidget(QWidget):
    def __init__(self, *a, parent=None):
        super().__init__(parent)
        self._cells = {}
        self._rows = 0
        self._cols = 0
        self._headers = []

    def setRowCount(self, r):
        self._rows = r

    def setColumnCount(self, c):
        self._cols = c

    def rowCount(self):
        return self._rows

    def columnCount(self):
        return self._cols

    def setHorizontalHeaderLabels(self, labels):
        self._headers = list(labels)

    def setItem(self, r, c, item):
        self._cells[(r, c)] = item

    def item(self, r, c):
        return self._cells.get((r, c))

    def resizeColumnsToContents(self):
        pass

    def clearContents(self):
        self._cells = {}

    def setSortingEnabled(self, on):
        pass

    def horizontalHeader(self):
        class _H:
            def setStretchLastSection(self, on):
                pass

        return _H()

    def setEditTriggers(self, *a):
        pass

    class EditTrigger:
        NoEditTriggers = 0


class QTextBrowser(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._html = ""

    def setHtml(self, h):
        self._html = h

    def setPlainText(self, t):
        self._html = t

    def toPlainText(self):
        return self._html

    def setOpenExternalLinks(self, on):
        pass


class QSplitter(QWidget):
    def __init__(self, *a, parent=None):
        super().__init__(parent)
        self._widgets = []

    def addWidget(self, w):
        self._widgets.append(w)

    def setSizes(self, sizes):
        self.sizes = sizes


class QDockWidget(QWidget):
    def __init__(self, title="", parent=None):
        super().__init__(parent)
        self.title = title
        self._widget = None

    def setWidget(self, w):
        self._widget = w


class _Menu:
    def __init__(self, title=""):
        self.title = title
        self.actions = []
        self.menus = []
        self.enabled = True

    def addAction(self, action):
        self.actions.append(action)
        return action

    def addMenu(self, title):
        m = _Menu(title)
        self.menus.append(m)
        return m

    def addSeparator(self):
        self.actions.append(None)

    def clear(self):
        self.actions = []

    def setEnabled(self, on):
        self.enabled = bool(on)


class _StatusBar:
    def __init__(self):
        self.messages = []

    def showMessage(self, msg, *a):
        self.messages.append(msg)


class QToolBar(QWidget):
    def __init__(self, title="", parent=None):
        super().__init__(parent)
        self.actions = []
        self._widgets = []

    def addAction(self, text, slot=None):
        a = QAction(text)
        if slot is not None:
            a.triggered.connect(lambda *_: slot())
        self.actions.append(a)
        return a

    def addWidget(self, w):
        self._widgets.append(w)

    def addSeparator(self):
        pass


class QMainWindow(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._menubar = _Menu()
        self._statusbar = _StatusBar()
        self._toolbars = []
        self._docks = []
        self._central = None

    def menuBar(self):
        return self._menubar

    def statusBar(self):
        return self._statusbar

    def addToolBar(self, bar):
        self._toolbars.append(bar)

    def setCentralWidget(self, w):
        self._central = w

    def addDockWidget(self, area, dock):
        self._docks.append((area, dock))

    def closeEvent(self, event):
        pass


class QFileDialog:
    """Static-call recorder; tests set next_path before invoking."""

    next_path = ""

    @classmethod
    def getOpenFileName(cls, *a, **k):
        return cls.next_path, "*"

    @classmethod
    def getSaveFileName(cls, *a, **k):
        return cls.next_path, "*"


class QMessageBox:
    shown = []  # (kind, title, text)

    @classmethod
    def critical(cls, parent, title, text):
        cls.shown.append(("critical", title, text))

    @classmethod
    def information(cls, parent, title, text):
        cls.shown.append(("information", title, text))

    @classmethod
    def warning(cls, parent, title, text):
        cls.shown.append(("warning", title, text))


class QInputDialog:
    next_int = (42, True)

    @classmethod
    def getInt(cls, *a, **k):
        return cls.next_int


class QApplication:
    _instance = None

    @classmethod
    def instance(cls):
        return cls._instance


# -- matplotlib qtagg canvas stub ---------------------------------------------

class FigureCanvasQTAgg:
    """Widget-shaped canvas: holds the figure, draw calls are no-ops
    (figures are real matplotlib Figure objects — assertions can inspect
    their axes)."""

    def __init__(self, figure=None):
        self.figure = figure

    def draw(self):
        pass

    def draw_idle(self):
        pass

    def setMinimumHeight(self, h):
        pass

    def mpl_connect(self, *a):
        return 0


# -- installer --------------------------------------------------------------

_CORE = {"QPointF": QPointF, "QRectF": QRectF, "Qt": Qt,
         "pyqtSignal": pyqtSignal, "QMimeData": QMimeData,
         "QPoint": QPoint, "QRect": QRect, "QSize": QSize,
         "QTimer": QTimer}
_GUI = {"QBrush": QBrush, "QColor": QColor, "QFont": QFont,
        "QPainter": QPainter, "QPen": QPen, "QDrag": QDrag,
        "QAction": QAction, "QKeySequence": QKeySequence}
_WIDGETS = {"QDialog": QDialog, "QDialogButtonBox": QDialogButtonBox,
            "QFormLayout": QFormLayout, "QGraphicsItem": QGraphicsItem,
            "QGraphicsRectItem": QGraphicsRectItem,
            "QGraphicsScene": QGraphicsScene,
            "QGraphicsView": QGraphicsView, "QSpinBox": QSpinBox,
            "QWidget": QWidget, "QVBoxLayout": QVBoxLayout,
            "QHBoxLayout": QHBoxLayout, "QGridLayout": QGridLayout,
            "QLayout": QLayout, "QLabel": QLabel, "QLineEdit": QLineEdit,
            "QPushButton": QPushButton, "QCheckBox": QCheckBox,
            "QComboBox": QComboBox, "QDoubleSpinBox": QDoubleSpinBox,
            "QSlider": QSlider, "QGroupBox": QGroupBox,
            "QToolBox": QToolBox, "QTabWidget": QTabWidget,
            "QTableWidget": QTableWidget,
            "QTableWidgetItem": QTableWidgetItem,
            "QTextBrowser": QTextBrowser, "QSplitter": QSplitter,
            "QDockWidget": QDockWidget, "QToolBar": QToolBar,
            "QMainWindow": QMainWindow, "QFileDialog": QFileDialog,
            "QMessageBox": QMessageBox, "QInputDialog": QInputDialog,
            "QApplication": QApplication}


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
    qtagg = types.ModuleType("matplotlib.backends.backend_qtagg")
    qtagg.FigureCanvasQTAgg = FigureCanvasQTAgg
    for name, mod in (("PyQt6", pkg), ("PyQt6.QtCore", core),
                      ("PyQt6.QtGui", gui), ("PyQt6.QtWidgets", widgets),
                      ("matplotlib.backends.backend_qtagg", qtagg)):
        monkeypatch.setitem(sys.modules, name, mod)
    for name in list(sys.modules):
        if name.startswith("quantum_simulator_tpu.gui"):
            del sys.modules[name]
    QDrag.executed.clear()
    QTimer.started.clear()
    QMessageBox.shown.clear()
    return True
