from quantum_simulator_tpu.reference import ReferenceData, ReferenceManager  # noqa: F401
