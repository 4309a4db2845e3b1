from quantum_simulator_tpu.utils.experiment import ExperimentConfig  # noqa: F401
from quantum_simulator_tpu.utils.seeding import SeedManager  # noqa: F401
