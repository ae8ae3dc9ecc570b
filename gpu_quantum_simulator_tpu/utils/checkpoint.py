"""State-vector checkpoint / resume.

The reference has no persistence at all — the state lives only in device
memory for the run (SURVEY §5).  Long sweeps here can snapshot the split
re/im state plus metadata and resume simulation from it (CLI:
--save-state / --load-state; API: Simulator.run(..., initial=...)).

Format: compressed .npz with re, im (float32/float64) and a metadata record.
Device arrays are gathered to host; at n=30 that is an 8 GB file — callers
at that scale should snapshot rarely (or not at all; sampling needs no
transfer).  A sharded-native (per-shard) format can layer on later without
changing the API.
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
