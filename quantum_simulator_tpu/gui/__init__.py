"""Qt GUI layer (requires PyQt6; all logic lives in toolkit-free
viewmodels/controllers so the GUI is a thin rendering shell).

Import is gated: ``HAS_QT`` reports availability and importing widgets
without PyQt6 raises a clear error (the reference degrades panel-by-panel,
``main_window.py:41-164``; here the whole layer degrades as one unit and
the engine/bridge/CLI remain fully usable headless).
"""

from __future__ import annotations

try:
    import PyQt6  # noqa: F401

    HAS_QT = True
except ImportError:  # pragma: no cover - environment without Qt
    HAS_QT = False

__all__ = ["HAS_QT"]
