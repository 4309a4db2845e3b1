from quantum_simulator_tpu.qec import (  # noqa: F401
    AVAILABLE_CODES,
    BitFlipCode,
    PhaseFlipCode,
    QECCode,
    QECResult,
    QECSimulator,
    RotatedSurfaceCode,
    SteaneCode,
    ThresholdPoint,
)
