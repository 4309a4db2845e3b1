from quantum_simulator_tpu.state import StateVector  # noqa: F401
