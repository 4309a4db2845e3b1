"""Circuit rendering/export (headless) and GUI import gating."""

from pathlib import Path

from quantum_simulator_tpu import GateInstance, QuantumCircuit
from quantum_simulator_tpu.algorithms import AlgorithmTemplate
from quantum_simulator_tpu.render import CircuitExporter, CircuitRenderer


def full_featured_circuit():
    c = QuantumCircuit(4)
    c.add_gate(GateInstance("H", [0], [], column=0))
    c.add_gate(GateInstance("Rx", [1], [0.5], column=0))
    c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
    c.add_gate(GateInstance("CZ", [1, 2], [], column=2))
    c.add_gate(GateInstance("SWAP", [2, 3], [], column=3))
    c.add_gate(GateInstance("Toffoli", [0, 1, 2], [], column=4))
    c.add_gate(GateInstance("Barrier", [0], [], column=5))
    c.add_gate(GateInstance("Measure", [0], [], column=6))
    return c


def test_export_png_and_svg(tmp_path: Path):
    c = full_featured_circuit()
    png = tmp_path / "circuit.png"
    svg = tmp_path / "circuit.svg"
    CircuitExporter.export_png(c, png)
    CircuitExporter.export_svg(c, svg, theme="light")
    assert png.stat().st_size > 1000
    svg_text = svg.read_text()
    assert "<svg" in svg_text


def test_render_template():
    c = AlgorithmTemplate.quantum_fourier_transform(3)
    fig = CircuitRenderer().figure(c)
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_gui_gating():
    from quantum_simulator_tpu.gui import HAS_QT

    assert isinstance(HAS_QT, bool)
    # In this environment PyQt6 is absent; main() must degrade cleanly.
    if not HAS_QT:
        import main as app_main

        assert app_main.main() == 1


def test_theme_manager_stylesheets():
    from quantum_simulator_tpu.gui.themes.theme_manager import ThemeManager

    tm = ThemeManager("dark")
    assert "QWidget" in tm.stylesheet()
    assert "QWidget" in tm.stylesheet("light")
    assert tm.stylesheet() != tm.stylesheet("light")
