"""Single-chip huge-state acceptance drive (REAL TPU, n = 30..31).

Runs the public ``Simulator.run`` surface through every huge-state
regime and checks the physics:

  1. all-real brickwork n=30  (4 GiB f32 state, f32 sampling)
  2. complex (T-column) n=30  (8 GiB planar state, bf16 sampling tier)
  3. QFT-30                   (diag-heavy planar; marginals exactly 0.5)
  4. all-real brickwork n=31  (8 GiB state, bf16 sampling tier)
  5. Grover-30, 3 iterations  (wide-MCZ phase passes; marked amplitude
                               must equal sin(7*asin(2^-15)) up to the
                               global -1 of the H-X-MCZ-X-H diffusion)

Takes ~15-30 min cold (remote compiles); each case re-validates the
donation chain, AUTO layouts, chunk windows, and the streaming sampler
(see ops/bigstate.py). Run on the TPU host with no env overrides:

    python scripts/huge_state_check.py
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def brickwork(n, depth, seed, t_col=False):
    from quantum_simulator_tpu import GateInstance, QuantumCircuit

    rng = np.random.default_rng(seed)
    c = QuantumCircuit(n)
    col = 0
    for d in range(depth):
        for q in range(n):
            c.add_gate(GateInstance("Ry", [q],
                                    [float(rng.uniform(0, 2 * np.pi))],
                                    column=col))
        col += 1
        for q in range(d % 2, n - 1, 2):
            c.add_gate(GateInstance("CNOT", [q, q + 1], [], column=col))
        col += 1
    if t_col:
        for q in range(n):
            c.add_gate(GateInstance("T", [q], [], column=col))
    return c


def main() -> int:
    from quantum_simulator_tpu.utils.preflight import require_device_or_cpu

    if not require_device_or_cpu():
        print("huge-state check needs the TPU chip; refusing to run "
              "8 GiB states on the host CPU", file=sys.stderr)
        return 2
    import jax

    from quantum_simulator_tpu import Simulator
    from quantum_simulator_tpu.algorithms import AlgorithmTemplate

    print("devices:", jax.devices(), flush=True)
    ok = True

    def check(name, cond, detail=""):
        nonlocal ok
        print(f"  [{'PASS' if cond else 'FAIL'}] {name} {detail}",
              flush=True)
        ok = ok and cond

    def timed_run(label, circuit, shots, seed):
        t0 = time.perf_counter()
        res = Simulator().run(circuit, shots=shots, seed=seed)
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.1f}s (cold includes compile)", flush=True)
        return res

    # 1. all-real n=30
    res = timed_run("n=30 all-real brickwork", brickwork(30, 4, 7),
                    10_000, 11)
    check("n=30 norm", abs(res.final_state.norm_sq() - 1.0) < 1e-4)
    check("n=30 shots", sum(res.measurement_counts.values()) == 10_000)
    check("n=30 real state", not res.final_state.is_planar)
    res.final_state.state_data.delete(); del res

    # 2. complex n=30
    res = timed_run("n=30 complex (T column)", brickwork(30, 2, 7, True),
                    5_000, 13)
    check("n=30c norm", abs(res.final_state.norm_sq() - 1.0) < 1e-4)
    check("n=30c planar", res.final_state.is_planar)
    res.final_state.state_data.delete(); del res

    # 3. QFT-30
    res = timed_run("QFT-30", AlgorithmTemplate.quantum_fourier_transform(30),
                    2_000, 5)
    qp = res.final_state.qubit_probabilities()
    check("QFT-30 marginals = 0.5", bool(np.allclose(qp, 0.5, atol=1e-4)))
    check("QFT-30 spread", len(res.measurement_counts) > 1900)
    res.final_state.state_data.delete(); del res

    # 4. n=31
    res = timed_run("n=31 all-real brickwork", brickwork(31, 4, 9),
                    10_000, 21)
    check("n=31 norm", abs(res.final_state.norm_sq() - 1.0) < 1e-4)
    check("n=31 shots", sum(res.measurement_counts.values()) == 10_000)
    res.final_state.state_data.delete(); del res

    # 5. Grover-30 amplitude amplification (exact)
    marked = 123456789
    g = AlgorithmTemplate.grover_search(30, marked_state=marked,
                                        num_iterations=3)
    res = timed_run("Grover-30 x3", g, 0, 1)
    amp = res.final_state.amplitude(marked).real
    expect = math.sin(7 * math.asin(2 ** -15))
    # H-X-MCZ-X-H diffusion = -1 x the textbook operator: 3 iterations
    # flip the global sign.
    rel = abs(abs(amp) - expect) / expect
    check("Grover-30 amplitude", rel < 1e-3,
          f"|amp|={abs(amp):.6e} vs {expect:.6e} (rel {rel:.1e})")
    res.final_state.state_data.delete(); del res

    print("HUGE-STATE CHECK:", "ALL PASS" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
