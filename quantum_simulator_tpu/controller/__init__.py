"""MVC controller layer: undoable circuit edits + async simulation runs.

Framework-agnostic (no Qt): the undo stack and the worker thread use plain
Python, with callback hooks a GUI toolkit can bind signals to. The
reference couples this layer to QUndoStack/QThread
(``/root/reference/quantum_sim/controller/``); decoupling it makes every
edit/undo/redo path unit-testable headless.
"""

from .commands import (
    AddGateCommand,
    ClearCircuitCommand,
    Command,
    LoadTemplateCommand,
    MoveGateCommand,
    RemoveGateCommand,
    SetQubitCountCommand,
    UndoStack,
    UpdateGateParamsCommand,
)
from .circuit_controller import CircuitController
from .simulation_controller import SimulationController

__all__ = [
    "AddGateCommand",
    "CircuitController",
    "ClearCircuitCommand",
    "Command",
    "LoadTemplateCommand",
    "MoveGateCommand",
    "RemoveGateCommand",
    "SetQubitCountCommand",
    "SimulationController",
    "UndoStack",
    "UpdateGateParamsCommand",
]
