from quantum_simulator_tpu.utils.appconfig import AppConfig  # noqa: F401
