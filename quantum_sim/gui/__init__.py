"""GUI facade over quantum_simulator_tpu.gui."""
from quantum_simulator_tpu.gui import HAS_QT  # noqa: F401
