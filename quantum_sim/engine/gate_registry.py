from quantum_simulator_tpu.registry import GateRegistry  # noqa: F401
