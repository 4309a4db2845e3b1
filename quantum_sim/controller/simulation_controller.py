from quantum_simulator_tpu.controller.simulation_controller import SimulationController  # noqa: F401
