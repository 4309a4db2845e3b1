from quantum_simulator_tpu.debugger import (  # noqa: F401
    CircuitDebugger,
    DebugSnapshot,
    NoiseAttribution,
    NoiseImpactResult,
)
