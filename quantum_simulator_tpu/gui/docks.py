"""Dock widgets: gate palette and gate properties editor.

Parity target: ``/root/reference/quantum_sim/gui/panels/gate_palette.py``
(sectioned palette built from the registry, refresh() for custom gates)
and ``properties_panel.py`` (per-qubit target spinboxes with control/target
roles, parameter spinboxes with pi presets, apply).
"""

from __future__ import annotations

import math

from PyQt6.QtCore import pyqtSignal
from PyQt6.QtWidgets import (
    QDoubleSpinBox,
    QFormLayout,
    QGridLayout,
    QGroupBox,
    QLabel,
    QPushButton,
    QSpinBox,
    QToolBox,
    QVBoxLayout,
    QWidget,
)

from ..gates import GateType
from ..registry import GateRegistry

_SECTIONS = [
    ("Single-Qubit", lambda gd: gd.gate_type == GateType.SINGLE
     and gd.num_params == 0),
    ("Rotations", lambda gd: gd.gate_type == GateType.SINGLE
     and gd.num_params > 0),
    ("Multi-Qubit", lambda gd: gd.gate_type in (GateType.CONTROLLED,
                                                GateType.MULTI)),
    ("Measurement", lambda gd: gd.gate_type in (GateType.MEASUREMENT,
                                                GateType.BARRIER)),
]


class GatePalette(QWidget):
    """Sectioned gate buttons; emits the chosen gate name."""

    gate_chosen = pyqtSignal(str)

    def __init__(self, parent=None):
        super().__init__(parent)
        layout = QVBoxLayout(self)
        self._toolbox = QToolBox()
        layout.addWidget(self._toolbox)
        self.refresh()

    def refresh(self) -> None:
        """Rebuild sections (picks up runtime-registered custom gates)."""
        while self._toolbox.count():
            w = self._toolbox.widget(0)
            self._toolbox.removeItem(0)
            w.deleteLater()
        registry = GateRegistry.instance()
        gates = registry.all_gates()
        used: set[str] = set()
        for title, predicate in _SECTIONS:
            page = QWidget()
            grid = QGridLayout(page)
            idx = 0
            for gd in gates:
                if gd.name in used or not predicate(gd):
                    continue
                used.add(gd.name)
                btn = QPushButton(gd.symbol)
                btn.setToolTip(gd.display_name)
                btn.setStyleSheet(
                    f"background-color: {gd.color}; color: white;"
                    "font-weight: bold;")
                btn.clicked.connect(
                    lambda _, name=gd.name: self.gate_chosen.emit(name))
                grid.addWidget(btn, idx // 4, idx % 4)
                idx += 1
            grid.setRowStretch(idx // 4 + 1, 1)
            self._toolbox.addItem(page, title)
        # Anything uncategorized (custom gates) gets its own section.
        leftovers = [gd for gd in gates if gd.name not in used]
        if leftovers:
            page = QWidget()
            grid = QGridLayout(page)
            for idx, gd in enumerate(leftovers):
                btn = QPushButton(gd.symbol)
                btn.clicked.connect(
                    lambda _, name=gd.name: self.gate_chosen.emit(name))
                grid.addWidget(btn, idx // 4, idx % 4)
            self._toolbox.addItem(page, "Custom")


class PropertiesPanel(QWidget):
    """Edits the selected gate's target qubits and parameters."""

    params_changed = pyqtSignal(object, list)        # (gate, new_params)
    targets_changed = pyqtSignal(object, list)       # (gate, new_targets)

    def __init__(self, parent=None):
        super().__init__(parent)
        self._gate = None
        self._registry = GateRegistry.instance()
        layout = QVBoxLayout(self)
        self.title = QLabel("No gate selected")
        layout.addWidget(self.title)
        self._targets_box = QGroupBox("Target qubits")
        self._targets_form = QFormLayout(self._targets_box)
        layout.addWidget(self._targets_box)
        self._params_box = QGroupBox("Parameters")
        self._params_form = QFormLayout(self._params_box)
        layout.addWidget(self._params_box)
        apply_btn = QPushButton("Apply")
        apply_btn.clicked.connect(self._apply)
        layout.addWidget(apply_btn)
        layout.addStretch(1)
        self._target_spins: list[QSpinBox] = []
        self._param_spins: list[QDoubleSpinBox] = []

    def set_gate(self, gate, num_qubits: int) -> None:
        self._gate = gate
        for form in (self._targets_form, self._params_form):
            while form.rowCount():
                form.removeRow(0)
        self._target_spins = []
        self._param_spins = []
        if gate is None:
            self.title.setText("No gate selected")
            return
        gd = self._registry.get(gate.gate_name)
        self.title.setText(f"{gd.display_name} @ column {gate.column}")
        for i, q in enumerate(gate.target_qubits):
            role = ("control" if i < gd.num_controls else "target")
            spin = QSpinBox()
            spin.setRange(0, num_qubits - 1)
            spin.setValue(q)
            self._target_spins.append(spin)
            self._targets_form.addRow(f"{role} {i}", spin)
        for i, name in enumerate(gd.param_names):
            spin = QDoubleSpinBox()
            spin.setRange(-4 * math.pi, 4 * math.pi)
            spin.setDecimals(6)
            spin.setValue(gate.params[i] if i < len(gate.params) else 0.0)
            self._param_spins.append(spin)
            self._params_form.addRow(name, spin)

    def _apply(self) -> None:
        if self._gate is None:
            return
        new_targets = [s.value() for s in self._target_spins]
        if new_targets != self._gate.target_qubits:
            self.targets_changed.emit(self._gate, new_targets)
        new_params = [s.value() for s in self._param_spins]
        if new_params != self._gate.params:
            self.params_changed.emit(self._gate, new_params)
