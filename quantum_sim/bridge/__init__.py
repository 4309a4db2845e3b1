"""Bridge facade over quantum_simulator_tpu.bridge."""
