from quantum_simulator_tpu.algorithms import AlgorithmTemplate  # noqa: F401
