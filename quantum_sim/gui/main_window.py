from quantum_simulator_tpu.gui.main_window import MainWindow  # noqa: F401
