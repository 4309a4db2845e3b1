from quantum_simulator_tpu.bridge.protocol import (  # noqa: F401
    DEFAULT_HOST,
    DEFAULT_PORT,
    BridgeMessage,
)
