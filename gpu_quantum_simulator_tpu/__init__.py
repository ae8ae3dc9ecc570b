"""gpu_quantum_simulator_tpu — a TPU-native state-vector quantum circuit simulator.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
RiccardoFiorentini/GPU_quantum_simulator (nine standalone CUDA programs exploring
gate fusion, megakernels, constant-memory gate tables, and qubit permutation on a
single GPU — see /root/reference).  Instead of nine binaries this is ONE library
with composable circuit-compiler passes and a strategy knob:

  * ``qasm``      — OpenQASM 2/3 subset front-end (ref: quantum_simulator.c:115-254)
  * ``ir``        — gate matrices + circuit IR + dense op-tables
  * ``passes``    — fusion (2x2 / 4x4 / k-qubit), qubit permutation, shard planning
  * ``ops``       — gate application primitives (XLA einsum + Pallas kernels)
  * ``engine``    — simulation strategies mirroring the reference ablations
  * ``parallel``  — mesh-sharded state vectors, all_to_all qubit swaps
  * ``ref``       — double-precision CPU ground truth (NumPy + native C++)
  * ``models``    — circuit families (Bell, GHZ, QFT, Grover-profile random, ...)
  * ``bench``     — the tester.bash-equivalent sweep harness

Qubit convention matches the reference: qubit ``k`` is bit ``k`` of the basis
index (little-endian; ref: quantum_simulator.c:83 ``mask = 1<<target``).
"""

from .utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from .ir.circuit import Gate, Circuit
from .ir.oplist import circuit_unitary
from .ir import gates
from .qasm.parser import (QasmError, parse_qasm, parse_qasm_dynamic,
                          parse_qasm_dynamic_file, parse_qasm_file)
from .engine.simulator import Simulator, simulate
from .config import SimulatorConfig
from . import models
from .dynamic import DynamicCircuit, run_dynamic, run_dynamic_batched
from .density import DensitySimulator, NoisyCircuit
from .gradients import (adjoint_gradient, make_adjoint_value_and_grad,
                        parameter_shift, run_vqe)
from .observables import (expectation_pauli, expectation_pauli_sum,
                          overlap, pauli_decompose, state_fidelity)
from .interop import from_qiskit
from .mps import MPS, run_mps
from .mitigation import (folded, mitigate_readout,
                         mitigate_readout_expectation_z,
                         zne_expectation)
from .shadows import shadow_snapshots, shadows_expectation
from .sampling import (
    expectation_z,
    norm_device,
    sample_state_device,
    top_amplitudes_device,
)

__version__ = "0.1.0"

__all__ = [
    "Gate",
    "Circuit",
    "gates",
    "models",
    "circuit_unitary",
    "QasmError",
    "parse_qasm",
    "parse_qasm_dynamic",
    "parse_qasm_dynamic_file",
    "parse_qasm_file",
    "Simulator",
    "simulate",
    "SimulatorConfig",
    "sample_state_device",
    "top_amplitudes_device",
    "expectation_z",
    "norm_device",
    "DynamicCircuit",
    "run_dynamic",
    "run_dynamic_batched",
    "DensitySimulator",
    "NoisyCircuit",
    "adjoint_gradient",
    "make_adjoint_value_and_grad",
    "parameter_shift",
    "run_vqe",
    "expectation_pauli",
    "expectation_pauli_sum",
    "pauli_decompose",
    "overlap",
    "state_fidelity",
    "from_qiskit",
    "folded",
    "zne_expectation",
    "mitigate_readout",
    "MPS",
    "run_mps",
    "mitigate_readout_expectation_z",
    "shadow_snapshots",
    "shadows_expectation",
]
