from quantum_simulator_tpu.comparison import (  # noqa: F401
    CircuitComparator,
    CircuitMetrics,
    ComparisonResult,
)
