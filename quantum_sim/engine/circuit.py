from quantum_simulator_tpu.circuit import *  # noqa: F401,F403
from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit  # noqa: F401
