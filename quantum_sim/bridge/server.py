from quantum_simulator_tpu.bridge.server import (  # noqa: F401
    BridgeCommandHandler,
    BridgeServer,
)
