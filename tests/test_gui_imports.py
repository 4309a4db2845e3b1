"""GUI modules must at least import cleanly (PyQt6 is mocked — this
environment has no Qt, but module-level names/imports are validated)."""

import importlib
import sys
import types

import pytest


def _make_mock(name):
    class _MockMeta(type):
        def __getattr__(cls, attr):
            return _make_mock(attr)

    return _MockMeta(name, (), {
        "__init__": lambda self, *a, **k: None,
        "__call__": lambda self, *a, **k: None,
        "__getattr__": lambda self, attr: _make_mock(attr)(),
    })


@pytest.fixture()
def mocked_qt(monkeypatch):
    try:
        import PyQt6  # noqa: F401

        yield  # real Qt present: nothing to mock
        return
    except ImportError:
        pass

    for mod in ["PyQt6", "PyQt6.QtCore", "PyQt6.QtGui", "PyQt6.QtWidgets"]:
        m = types.ModuleType(mod)
        m.__getattr__ = lambda name: _make_mock(name)
        monkeypatch.setitem(sys.modules, mod, m)

    def pyqt_signal(*a, **k):
        class _Sig:
            def connect(self, *a, **k):
                pass

            def emit(self, *a, **k):
                pass

            def __get__(self, obj, owner):
                return self

        return _Sig()

    sys.modules["PyQt6.QtCore"].pyqtSignal = pyqt_signal

    mb = types.ModuleType("matplotlib.backends.backend_qtagg")
    mb.FigureCanvasQTAgg = _make_mock("FigureCanvasQTAgg")
    monkeypatch.setitem(sys.modules,
                        "matplotlib.backends.backend_qtagg", mb)
    yield
    # Purge gui modules imported under mocks so other tests see clean state.
    for name in list(sys.modules):
        if name.startswith("quantum_simulator_tpu.gui") and \
                name != "quantum_simulator_tpu.gui":
            sys.modules.pop(name)


GUI_MODULES = [
    "quantum_simulator_tpu.gui.circuit_view",
    "quantum_simulator_tpu.gui.editor_scene",
    "quantum_simulator_tpu.gui.panels",
    "quantum_simulator_tpu.gui.advanced_panels",
    "quantum_simulator_tpu.gui.dialogs",
    "quantum_simulator_tpu.gui.docks",
    "quantum_simulator_tpu.gui.main_window",
]


def test_gui_modules_import(mocked_qt):
    for name in GUI_MODULES:
        importlib.import_module(name)
