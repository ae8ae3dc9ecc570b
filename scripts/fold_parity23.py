"""On-chip amplitude parity of the new flat fold default at n=23:
prefetch (fold ON via resolve_stream_relayout) vs the wide engine."""
import numpy as np, jax.numpy as jnp
import gpu_quantum_simulator_tpu as Q
from gpu_quantum_simulator_tpu import models
n = 23
c = models.grover_like(n, num_gates=2445, seed=318)
pf = Q.Simulator(Q.SimulatorConfig(strategy='prefetch'))
re1, im1, ops1 = pf.run_device(c)
mx = Q.Simulator(Q.SimulatorConfig(strategy='mxu'))
re2, im2, ops2 = mx.run_device(c)
err = max(float(jnp.max(jnp.abs(re1 - re2))), float(jnp.max(jnp.abs(im1 - im2))))
norm = float(jnp.sum(re1*re1) + jnp.sum(im1*im1))
print(f"n=23 fold-vs-mxu max|dcomp|={err:.2e} norm={norm:.8f} ops={ops1}/{ops2}")
assert err < 2e-5 and abs(norm-1) < 1e-3, (err, norm)
print("FOLD PARITY OK")
