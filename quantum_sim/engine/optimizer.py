from quantum_simulator_tpu.optimizer import (  # noqa: F401
    BarrenPlateauAnalysis,
    CircuitOptimizer,
    CostFunction,
    GradientEstimator,
    OptimizationResult,
    ParameterBinding,
    ParameterizedCircuitConfig,
)
