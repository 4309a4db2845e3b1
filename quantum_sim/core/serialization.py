from quantum_simulator_tpu.utils.serialization import CircuitSerializer  # noqa: F401
