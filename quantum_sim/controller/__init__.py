"""Controller facade over quantum_simulator_tpu.controller."""
