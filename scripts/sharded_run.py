"""Run a circuit on a mesh-sharded statevector and sample it.

The capability the reference lacks entirely: the amplitude vector is split
across a device mesh (``--devices``), gates on device-index qubits move
data with ppermute collectives. On a single-chip host, use
``--virtual-cpu`` to validate sharding logic on XLA's host platform.

Usage:
    python scripts/sharded_run.py --template ghz --qubits 8 --devices 4 \
        --shots 1000 --virtual-cpu
    python scripts/sharded_run.py --qsim my_circuit.qsim --devices 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main():
    parser = argparse.ArgumentParser(
        description="Mesh-sharded statevector run")
    parser.add_argument("--template", choices=["ghz", "qft", "brickwork"],
                        default="ghz")
    parser.add_argument("--qubits", type=int, default=8)
    parser.add_argument("--depth", type=int, default=8,
                        help="depth for --template brickwork")
    parser.add_argument("--qsim", type=str, default=None,
                        help="load a .qsim circuit instead of a template")
    parser.add_argument("--devices", type=int, default=None,
                        help="mesh size (power of 2; default: all devices)")
    parser.add_argument("--shots", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--noise-p", type=float, default=0.0,
                        help="depolarizing probability for one noisy "
                             "trajectory demo")
    parser.add_argument("--virtual-cpu", action="store_true",
                        help="simulate the mesh with 8 virtual CPU devices")
    parser.add_argument("--multihost", action="store_true",
                        help="join a multi-host process group via "
                             "jax.distributed.initialize (coordinator / "
                             "process count from COORDINATOR_ADDRESS, "
                             "NUM_PROCESSES, PROCESS_ID env vars)")
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args()

    if args.virtual_cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8").strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    if args.multihost:
        from quantum_simulator_tpu.parallel import initialize_multihost

        spec = initialize_multihost()
        print(f"Multi-host: process {spec.process_id}/"
              f"{spec.num_processes} via {spec.coordinator}")

    import numpy as np

    from quantum_simulator_tpu.algorithms import AlgorithmTemplate
    from quantum_simulator_tpu.models import brickwork_circuit
    from quantum_simulator_tpu.parallel import DistributedSimulator
    from quantum_simulator_tpu.utils.serialization import CircuitSerializer

    if args.qsim:
        circuit = CircuitSerializer.load(args.qsim)
    elif args.template == "ghz":
        circuit = AlgorithmTemplate.ghz_state(args.qubits)
    elif args.template == "qft":
        circuit = AlgorithmTemplate.quantum_fourier_transform(args.qubits)
    else:
        circuit = brickwork_circuit(args.qubits, args.depth, seed=args.seed)

    sim = DistributedSimulator(n_devices=args.devices)
    mesh_size = sim.mesh.shape[sim.mesh.axis_names[0]]
    print(f"Mesh: {mesh_size} devices | circuit: n={circuit.num_qubits}, "
          f"{circuit.gate_count()} gates")

    state = sim.run(circuit)
    counts = sim.sample(state, args.shots, np.random.default_rng(args.seed))
    top = sorted(counts.items(), key=lambda kv: -kv[1])[:8]

    result = {
        "experiment": "sharded_run",
        "mesh_devices": int(mesh_size),
        "num_qubits": circuit.num_qubits,
        "norm": state.norm(),
        "shots": args.shots,
        "top_counts": dict(top),
    }

    if args.noise_p > 0:
        from quantum_simulator_tpu.noise import (
            DepolarizingNoise,
            NoiseModel,
        )

        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(args.noise_p))
        noisy = sim.run_noisy_trajectory(circuit, nm, seed=args.seed)
        result["noisy_trajectory_fidelity"] = sim.fidelity(state, noisy)

    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2)
        print(f"Saved to {args.output}")
    else:
        print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
