from quantum_simulator_tpu.gates import *  # noqa: F401,F403
