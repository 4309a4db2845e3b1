from quantum_simulator_tpu.bridge.client import BridgeError, SimulatorClient  # noqa: F401
