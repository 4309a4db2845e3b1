from quantum_simulator_tpu.measurement import MeasurementBasis, MeasurementEngine  # noqa: F401
