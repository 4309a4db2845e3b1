from quantum_simulator_tpu.controller.circuit_controller import CircuitController  # noqa: F401
from quantum_simulator_tpu.controller.commands import (  # noqa: F401
    AddGateCommand,
    ClearCircuitCommand,
    LoadTemplateCommand,
    MoveGateCommand,
    RemoveGateCommand,
    SetQubitCountCommand,
    UndoStack,
    UpdateGateParamsCommand,
)
