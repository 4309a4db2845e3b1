"""Drag-and-drop editor logic (gui/editor_model.py) — toolkit-free, so
these run without Qt. The Qt scene (editor_scene.py) is a thin shell over
this model; its import is covered by test_gui_imports."""

import pytest

from quantum_simulator_tpu.circuit import QuantumCircuit
from quantum_simulator_tpu.controller import CircuitController
from quantum_simulator_tpu.gui.editor_model import (
    COL_W,
    ROW_H,
    TOP_Y,
    WIRE_X0,
    CircuitEditorModel,
)


@pytest.fixture()
def model():
    return CircuitEditorModel(CircuitController(QuantumCircuit(4)))


def scene_xy(model, column, qubit):
    return model.column_x(column), model.qubit_y(qubit)


class TestSnapping:
    def test_exact_grid_points(self, model):
        pos = model.snap(*scene_xy(model, 3, 2))
        assert (pos.column, pos.qubit) == (3, 2)

    def test_snaps_to_nearest(self, model):
        x = WIRE_X0 + 3 * COL_W + COL_W * 0.3
        y = TOP_Y + 2 * ROW_H - ROW_H * 0.3
        pos = model.snap(x, y)
        assert (pos.column, pos.qubit) == (3, 2)

    def test_outside_grid_is_none(self, model):
        assert model.snap(-200.0, TOP_Y) is None
        assert model.snap(WIRE_X0, TOP_Y + 100 * ROW_H) is None


class TestPaletteDrop:
    def test_single_qubit_drop_into_column_3(self, model):
        """The VERDICT acceptance: drag H from the palette into column 3
        and the model updates through the undo stack."""
        plan = model.plan_drop("H", *scene_xy(model, 3, 1))
        assert plan.valid and not plan.needs_target_dialog
        assert (plan.column, plan.targets) == (3, (1,))
        assert model.commit_drop(plan)
        gates = model.circuit.gates
        assert len(gates) == 1
        assert gates[0].gate_name == "H"
        assert gates[0].column == 3 and gates[0].target_qubits == [1]
        # through the undo stack:
        model.controller.undo()
        assert model.circuit.gates == []
        model.controller.redo()
        assert len(model.circuit.gates) == 1

    def test_multi_qubit_proposes_downward_targets(self, model):
        plan = model.plan_drop("CNOT", *scene_xy(model, 0, 1))
        assert plan.valid and plan.needs_target_dialog
        assert plan.targets == (1, 2)

    def test_multi_qubit_near_bottom_proposes_upward(self, model):
        plan = model.plan_drop("Toffoli", *scene_xy(model, 0, 3))
        assert plan.valid
        assert plan.targets == (3, 2, 1)

    def test_occupied_cell_invalid(self, model):
        first = model.plan_drop("X", *scene_xy(model, 2, 1))
        assert model.commit_drop(first)
        again = model.plan_drop("Y", *scene_xy(model, 2, 1))
        assert not again.valid and again.reason == "cell occupied"
        assert not model.commit_drop(again)

    def test_dialog_targets_override_proposal(self, model):
        plan = model.plan_drop("CNOT", *scene_xy(model, 1, 0))
        assert model.commit_drop(plan, targets=(0, 3))
        assert model.circuit.gates[0].target_qubits == [0, 3]

    def test_duplicate_dialog_targets_rejected(self, model):
        plan = model.plan_drop("CNOT", *scene_xy(model, 1, 0))
        assert not model.commit_drop(plan, targets=(2, 2))

    def test_gate_larger_than_circuit(self):
        m = CircuitEditorModel(CircuitController(QuantumCircuit(2)))
        plan = m.plan_drop("Toffoli", m.column_x(0), m.qubit_y(0))
        assert not plan.valid and "needs 3 qubits" in plan.reason

    def test_drop_outside_grid(self, model):
        plan = model.plan_drop("H", -500.0, -500.0)
        assert not plan.valid


class TestDragToMove:
    def test_move_snaps_and_commits_undoably(self, model):
        plan = model.plan_drop("H", *scene_xy(model, 0, 0))
        model.commit_drop(plan)
        gate = model.circuit.gates[0]
        move = model.plan_move(gate, *scene_xy(model, 5, 2))
        assert move == (5, (2,))
        assert model.commit_move(gate, *move)
        assert gate.column == 5 and gate.target_qubits == [2]
        model.controller.undo()
        assert gate.column == 0 and gate.target_qubits == [0]

    def test_move_preserves_multiqubit_spacing(self, model):
        plan = model.plan_drop("CNOT", *scene_xy(model, 0, 0))
        model.commit_drop(plan, targets=(0, 2))
        gate = model.circuit.gates[0]
        move = model.plan_move(gate, *scene_xy(model, 1, 1))
        assert move == (1, (1, 3))

    def test_move_out_of_range_is_none(self, model):
        plan = model.plan_drop("CNOT", *scene_xy(model, 0, 0))
        model.commit_drop(plan, targets=(0, 3))
        gate = model.circuit.gates[0]
        # shifting down by 1 pushes target 3 -> 4, out of a 4-qubit grid
        assert model.plan_move(gate, *scene_xy(model, 0, 1)) is None

    def test_move_onto_occupied_cell_is_none(self, model):
        model.commit_drop(model.plan_drop("X", *scene_xy(model, 2, 2)))
        model.commit_drop(model.plan_drop("H", *scene_xy(model, 0, 0)))
        h_gate = model.circuit.gates[1]
        assert model.plan_move(h_gate, *scene_xy(model, 2, 2)) is None

    def test_noop_move_not_committed(self, model):
        model.commit_drop(model.plan_drop("H", *scene_xy(model, 1, 1)))
        gate = model.circuit.gates[0]
        assert not model.commit_move(gate, 1, (1,))


class TestOverlaysAndSelection:
    def test_breakpoint_toggle(self, model):
        assert model.toggle_breakpoint(2) is True
        assert model.breakpoints == {2}
        assert model.toggle_breakpoint(2) is False
        assert model.breakpoints == set()

    def test_debug_column(self, model):
        model.set_debug_column(4)
        assert model.debug_column == 4
        model.set_debug_column(None)
        assert model.debug_column is None

    def test_hit_test(self, model):
        model.commit_drop(model.plan_drop("X", *scene_xy(model, 2, 1)))
        gate = model.hit_test(*scene_xy(model, 2, 1))
        assert gate is model.circuit.gates[0]
        assert model.hit_test(*scene_xy(model, 0, 0)) is None

    def test_delete_selection_undoable(self, model):
        model.commit_drop(model.plan_drop("X", *scene_xy(model, 0, 0)))
        model.commit_drop(model.plan_drop("Y", *scene_xy(model, 1, 1)))
        model.set_selection(list(model.circuit.gates))
        assert model.delete_selection() == 2
        assert model.circuit.gates == []
        model.controller.undo()
        model.controller.undo()
        assert len(model.circuit.gates) == 2

    def test_initial_state_toggle(self, model):
        assert model.toggle_initial_state(1) == 1
        assert model.wire_labels()[1] == (1, "q1: |1⟩")
        assert model.toggle_initial_state(1) == 0

    def test_gate_visual_kinds(self, model):
        model.commit_drop(model.plan_drop("H", *scene_xy(model, 0, 0)))
        model.commit_drop(
            model.plan_drop("CNOT", *scene_xy(model, 1, 0)), (0, 1))
        model.commit_drop(
            model.plan_drop("SWAP", *scene_xy(model, 2, 2)), (2, 3))
        kinds = [v.kind for v in model.gate_visuals()]
        assert kinds == ["single", "controlled", "swap"]

    def test_changed_callback_fires(self, model):
        fired = []
        model.on_changed(lambda: fired.append(1))
        model.commit_drop(model.plan_drop("H", *scene_xy(model, 0, 0)))
        assert fired


class TestReviewRegressions:
    def test_move_anchor_is_min_target(self, model):
        """A CNOT placed with control BELOW target (target_qubits=[1, 0])
        must move relative to its topmost qubit — the scene draws the item
        origin at min(targets)."""
        plan = model.plan_drop("CNOT", *scene_xy(model, 0, 1))
        assert model.commit_drop(plan, targets=(1, 0))
        gate = model.circuit.gates[0]
        # drop the item's top (qubit 0's row) onto qubit 2's row
        move = model.plan_move(gate, *scene_xy(model, 0, 2))
        assert move == (0, (3, 2))
