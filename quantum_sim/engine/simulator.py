from quantum_simulator_tpu.simulator import SimulationResult, Simulator  # noqa: F401
