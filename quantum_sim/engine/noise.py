from quantum_simulator_tpu.noise import (  # noqa: F401
    AmplitudeDampingNoise,
    BitFlipNoise,
    DepolarizingNoise,
    NoiseChannel,
    NoiseModel,
    PhaseFlipNoise,
    ReadoutError,
    ThermalRelaxationNoise,
    TwoQubitDepolarizingNoise,
)
