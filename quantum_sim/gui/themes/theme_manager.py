from quantum_simulator_tpu.gui.themes.theme_manager import ThemeManager  # noqa: F401
