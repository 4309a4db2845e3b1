from quantum_simulator_tpu.benchmarks import BenchmarkResult, BenchmarkSuite  # noqa: F401
