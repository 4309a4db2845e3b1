"""GUI application entry point.

Parity target: ``/root/reference/main.py`` (QApplication bootstrap, theme
from persisted config, MainWindow). Degrades with a clear message when
PyQt6 is unavailable — the engine, bridge, and CLI scripts stay fully
usable headless.
"""

from __future__ import annotations

import sys


def main() -> int:
    from quantum_simulator_tpu.gui import HAS_QT

    if not HAS_QT:
        print("PyQt6 is not installed; the GUI is unavailable.\n"
              "Headless alternatives:\n"
              "  python scripts/noise_sweep.py --circuit bell\n"
              "  python scripts/vqe_benchmark.py --qubits 4\n"
              "  python scripts/qec_threshold.py --codes bit_flip,steane\n"
              "  python -c 'from quantum_simulator_tpu.bridge import "
              "BridgeServer; BridgeServer().start()'  # TCP control API")
        return 1

    from PyQt6.QtWidgets import QApplication

    from quantum_simulator_tpu.gui.main_window import MainWindow
    from quantum_simulator_tpu.gui.themes.theme_manager import ThemeManager
    from quantum_simulator_tpu.utils.appconfig import AppConfig

    from quantum_simulator_tpu.config import CONFIG

    # Editor sessions churn circuit structure: route fresh structures
    # through the skeleton-keyed executor (ops/plan.py) so a 1-gate
    # edit reruns in milliseconds instead of paying a remote recompile.
    CONFIG.interactive = True

    app = QApplication(sys.argv)
    config = AppConfig.load()
    ThemeManager(config.theme).apply(app)
    window = MainWindow(config)
    window.show()
    return app.exec()


if __name__ == "__main__":
    sys.exit(main())
