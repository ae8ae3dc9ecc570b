"""State-vector checkpoint / resume.

The reference has no persistence at all — the state lives only in device
memory for the run (SURVEY §5).  Long sweeps here can snapshot the split
re/im state plus metadata and resume simulation from it (CLI:
--save-state / --load-state; API: Simulator.run(..., initial=...)).

Format: compressed .npz with re, im (float32/float64) and a metadata record.
Device arrays are gathered to host; at n=30 that is an 8 GB file — callers
at that scale should snapshot rarely (or not at all; sampling needs no
transfer), or use the split-halves form (save_state_halves) that never
joins the state.  A sharded-native no-host-gather format also exists below
(save_state_sharded / load_state_sharded, orbax-backed): each device writes
its own shard, so a mesh-sharded state checkpoints without ever gathering.
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import numpy as np


def save_state(path: str, re, im, num_qubits: int, meta: Optional[dict] = None) -> None:
    re = np.asarray(re)
    im = np.asarray(im)
    if re.shape != (1 << num_qubits,) or im.shape != re.shape:
        raise ValueError("state arrays do not match num_qubits")
    record = {"num_qubits": num_qubits, "dtype": str(re.dtype)}
    if meta:
        record.update(meta)
    np.savez_compressed(path, re=re, im=im, meta=json.dumps(record))


def load_state(path: str) -> Tuple[np.ndarray, np.ndarray, dict]:
    with np.load(path) as z:
        re, im = z["re"], z["im"]
        meta = json.loads(str(z["meta"]))
    if re.shape != (1 << int(meta["num_qubits"]),):
        raise ValueError(f"corrupt checkpoint: shape {re.shape} vs meta {meta}")
    return re, im, meta


def save_state_halves(path: str, re0, re1, im0, im1, num_qubits: int,
                      meta: Optional[dict] = None) -> None:
    """Checkpoint a column-half-split state (the n >= 30 in-place layout)
    WITHOUT a flat 2^n join: the four (2^(n-8), 128) halves are fetched
    and written as-is (same total bytes as the flat format, but no
    contiguous 2^n device or host buffer is ever needed)."""
    halves = [np.asarray(x) for x in (re0, re1, im0, im1)]
    want = (1 << (num_qubits - 8), 128)
    for h in halves:
        if h.shape != want:
            raise ValueError(
                f"half shape {h.shape} != {want} for n = {num_qubits}")
    record = {"num_qubits": num_qubits, "dtype": str(halves[0].dtype),
              "layout": "halves"}
    if meta:
        record.update(meta)
    np.savez_compressed(path, re0=halves[0], re1=halves[1], im0=halves[2],
                        im1=halves[3], meta=json.dumps(record))


def load_state_halves(path: str):
    """((re0, re1, im0, im1), meta) from a :func:`save_state_halves` file."""
    with np.load(path) as z:
        if "re0" not in z:
            raise ValueError(
                f"{path} is not a split-state checkpoint (no 're0'); "
                "use load_state")
        parts = (z["re0"], z["re1"], z["im0"], z["im1"])
        meta = json.loads(str(z["meta"]))
    want = (1 << (int(meta["num_qubits"]) - 8), 128)
    if parts[0].shape != want:
        raise ValueError(f"corrupt checkpoint: {parts[0].shape} vs {meta}")
    return parts, meta


def save_state_sharded(path: str, re, im, num_qubits: int,
                       meta: Optional[dict] = None) -> None:
    """Checkpoint a MESH-SHARDED state without gathering to host.

    The .npz form above funnels the full 2^n state through one host buffer
    — at distributed scale (n >= 31, the sharded engine's reason to exist)
    that buffer doesn't fit anywhere.  Here each device's shard streams
    directly into an orbax/tensorstore directory (one OCDBT store, written
    in parallel per shard); metadata rides in a sidecar JSON.  ``re``/``im``
    are jax.Arrays with any sharding (from ShardedPrefetchProgram /
    run_sharded); restore with ``load_state_sharded`` under the SAME mesh
    geometry to resume, or under any other sharding — orbax reshards on
    read.
    """
    import os

    import orbax.checkpoint as ocp

    if re.shape != (1 << num_qubits,) or im.shape != re.shape:
        raise ValueError("state arrays do not match num_qubits")
    path = os.path.abspath(path)
    record = {"num_qubits": num_qubits, "dtype": str(re.dtype)}
    if meta:
        record.update(meta)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), {"re": re, "im": im})
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(record, f)


def load_state_sharded(path: str, mesh=None, axis: Optional[str] = None):
    """Restore a sharded checkpoint as (re, im, meta) jax.Arrays.

    With ``mesh``/``axis`` the state is restored SHARDED over that mesh
    axis (each device reads only its shard — no host funnel); without, it
    restores replicated on the default device (small-n convenience).
    """
    import os

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    shape = (1 << int(meta["num_qubits"]),)
    dtype = jnp.dtype(meta["dtype"])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec(axis))
        abstract = jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)
    else:
        abstract = jax.ShapeDtypeStruct(shape, dtype)
    with ocp.StandardCheckpointer() as ckptr:
        out = ckptr.restore(os.path.join(path, "state"),
                            {"re": abstract, "im": abstract})
    return out["re"], out["im"], meta
