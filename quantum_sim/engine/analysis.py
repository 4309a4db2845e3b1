from quantum_simulator_tpu.analysis import (  # noqa: F401
    BenchmarkAnalysis,
    ConvergenceAnalysis,
    EntanglementEvent,
    EntanglementEventDetector,
    EntanglementEventType,
    StateAnalysis,
)
