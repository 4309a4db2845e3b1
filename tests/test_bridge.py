"""Live Bridge: server + client over a real localhost TCP socket."""

import numpy as np
import pytest

from quantum_simulator_tpu.bridge import (
    BridgeCommandHandler,
    BridgeMessage,
    BridgeServer,
    SimulatorClient,
)
from quantum_simulator_tpu.bridge.client import BridgeError
from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit


@pytest.fixture
def server():
    srv = BridgeServer(port=0)  # ephemeral port
    srv.start()
    yield srv
    srv.stop()


@pytest.fixture
def client(server):
    with SimulatorClient(port=server.port) as c:
        yield c


def bell_dict():
    c = QuantumCircuit(2)
    c.add_gate(GateInstance("H", [0], [], column=0))
    c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
    return c.to_dict()


class TestProtocol:
    def test_message_roundtrip(self):
        msg = BridgeMessage(type="request", id="abc", action="run",
                            params={"shots": 10})
        again = BridgeMessage.from_json(msg.to_json())
        assert again.action == "run" and again.params == {"shots": 10}
        assert msg.to_bytes().endswith(b"\n")

    def test_response_constructors(self):
        ok = BridgeMessage.ok_response("id1", {"x": 1})
        assert ok.status == "ok" and ok.data == {"x": 1}
        err = BridgeMessage.error_response("id1", "boom")
        assert err.status == "error" and err.error == "boom"


class TestHandlerDirect:
    def test_unknown_action(self):
        h = BridgeCommandHandler()
        resp = h.handle(BridgeMessage(action="bogus", id="1"))
        assert resp.status == "error"
        assert "Unknown action" in resp.error

    def test_run_without_circuit(self):
        h = BridgeCommandHandler()
        resp = h.handle(BridgeMessage(action="run", id="1"))
        assert resp.status == "error"


class TestOverSocket:
    def test_ping(self, client):
        assert client.ping() is True

    def test_full_session(self, client):
        info = client.set_circuit(bell_dict())
        assert info == {"num_qubits": 2, "gate_count": 2}

        result = client.run(shots=1000, seed=42)
        assert sum(result["measurement_counts"].values()) == 1000
        assert set(result["measurement_counts"]) <= {"00", "11"}

        state = client.get_state()
        assert state["num_qubits"] == 2
        amps = state["amplitudes"]
        assert abs(amps[0]["re"] - 1 / np.sqrt(2)) < 1e-5
        assert abs(amps[3]["re"] - 1 / np.sqrt(2)) < 1e-5

        again = client.get_result()
        assert again["measurement_counts"] == result["measurement_counts"]

        analysis = client.get_analysis(["fidelity", "entropy", "purity"])
        assert analysis["fidelity"] == pytest.approx(1.0, abs=1e-5)
        assert analysis["purity"] == pytest.approx(1.0, abs=1e-4)

    def test_add_and_clear_gate(self, client):
        client.set_circuit(bell_dict())
        info = client.add_gate("X", [1], column=2)
        assert info["gate_count"] == 3
        circuit = client.get_circuit()
        assert len(circuit["gates"]) == 3
        client.clear_circuit()
        assert client.get_circuit()["gates"] == []

    def test_noise_and_sweep(self, client):
        client.set_circuit(bell_dict())
        client.set_noise({"global": [
            {"type": "DepolarizingNoise", "probability": 0.1}]})
        result = client.run(shots=200, seed=1)
        assert sum(result["measurement_counts"].values()) == 200
        client.clear_noise()

        sweep = client.sweep_parameter("noise_p", [0.0, 0.2], trials=10,
                                       seed=42)["sweep"]
        assert sweep[0]["fidelity"] == 1.0
        assert sweep[1]["fidelity"] < 0.99

    def test_pauli_analysis(self, client):
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("X", [0], [], column=0))
        client.set_circuit(c.to_dict())
        client.run(shots=0, seed=1)
        pauli = client.get_analysis(["pauli"])["pauli"]
        assert pauli["q0"]["Z"] == pytest.approx(-1.0, abs=1e-5)

    def test_error_propagates_to_client(self, client):
        with pytest.raises(BridgeError):
            client.get_result()  # no run yet

    def test_two_clients(self, server):
        with SimulatorClient(port=server.port) as c1, \
                SimulatorClient(port=server.port) as c2:
            assert c1.ping() and c2.ping()
            c1.set_circuit(bell_dict())
            # shared handler state: c2 sees c1's circuit
            assert len(c2.get_circuit()["gates"]) == 2


class TestChunkedState:
    """get_state windows: the streaming extension for large-n states."""

    def test_window_fetch(self, client):
        client.set_circuit(bell_dict())
        client.run(shots=0, seed=1)
        win = client.get_state(offset=2, length=2)
        assert win["total"] == 4 and win["offset"] == 2
        assert len(win["amplitudes"]) == 2
        assert abs(win["amplitudes"][1]["re"] - 1 / np.sqrt(2)) < 1e-5
        assert win["probabilities"][1] == pytest.approx(0.5, abs=1e-5)

    def test_window_clipping_and_errors(self, client):
        client.set_circuit(bell_dict())
        client.run(shots=0, seed=1)
        win = client.get_state(offset=3, length=100)
        assert len(win["amplitudes"]) == 1
        import pytest as _pytest
        with _pytest.raises(RuntimeError):
            client.get_state(offset=99)

    def test_iter_state_windows_reassembles(self, client):
        client.set_circuit(bell_dict())
        client.run(shots=0, seed=1)
        full = client.get_state()["amplitudes"]
        parts = []
        for off, amps in client.iter_state_windows(window=3):
            assert off == len(parts)
            parts.extend(amps)
        assert parts == full


class TestMPSEngineOverBridge:
    def test_wide_circuit_runs_on_mps_engine(self, client):
        # GHZ-40 over the wire: no dense state exists anywhere, yet the
        # bridge serves counts (+ the truncation ledger).
        n = 40
        gates = [{"name": "H", "targets": [0], "params": [],
                  "column": 0}]
        gates += [{"name": "CNOT", "targets": [q, q + 1],
                   "params": [], "column": q + 1} for q in range(n - 1)]
        client.set_circuit({"version": "1.0", "num_qubits": n,
                            "gates": gates})
        result = client.run(shots=200, seed=3, engine="mps", chi=4)
        counts = result["measurement_counts"]
        assert set(counts) <= {"0" * n, "1" * n}
        assert sum(counts.values()) == 200
        assert result["engine"] == "mps"
        assert result["truncation_weight"] == 0.0

    def test_unknown_engine_rejected(self, client):
        client.set_circuit(bell_dict())
        with pytest.raises(RuntimeError):
            client.run(shots=10, engine="tensor-network-9000")
