"""Chain-history IO: uniform chunked CSV writer + pytree checkpointing.

The reference flushes each sampler's chain to CSV every 10,000 iterations
with slightly different (and off-by-one-prone) index arithmetic per sampler
(``GlobalMCMC.py:70-76`` vs ``GLMCMC.py:105-111`` vs ``AGLMCMC.py:275-288``;
SURVEY quirk 6).  Here a single :class:`ChainWriter` handles all samplers:
the first row is the initial theta (reference header convention,
``GLMCMC.py:43-47``) and every sampled state is written exactly once, in
order, as segments stream off the device.

Checkpoint/resume (absent in the reference — write-only CSVs, SURVEY §5) is
a full snapshot of the scan carry (theta, y, RNG keys, cached weights,
adaptation state) as a ``.npz`` of pytree leaves.
"""

from __future__ import annotations

import csv
import json
import os
import pickle
from typing import Any

import jax
import numpy as np

__all__ = ["ChainWriter", "read_binary_chains", "save_carry", "load_carry",
           "carry_path"]


class _NativeMultiChainSink:
    """All-chain native sink: appends raw float32 ``(C, S, d)`` blocks
    (chain-major) to ONE binary file via the C++ async writer, with segment
    shapes recorded in a ``<path>.meta.json`` sidecar so
    :func:`read_binary_chains` can reconstruct the ``(C, T, d)`` history.

    One file + one background thread regardless of chain count — the
    scalable alternative to per-chain CSVs at 10^4+ chains."""

    def __init__(self, path: str, num_chains: int, dim: int):
        from ..native import NativeChainWriter

        self.path = path
        self.num_chains = int(num_chains)
        self.dim = int(dim)
        self._segments = []
        self._w = NativeChainWriter(path, self.dim, binary=True)

    def write_block(self, block: np.ndarray) -> None:
        """block: (C, S, d)."""
        C, S, d = block.shape
        assert C == self.num_chains and d == self.dim
        self._w.write(np.ascontiguousarray(block, np.float32).reshape(-1, d))
        self._segments.append(int(S))
        # Rewrite the (tiny) sidecar after every block so a crash mid-run
        # leaves the already-flushed history readable; the binary payload may
        # trail the sidecar by at most the async writer's in-flight block,
        # which read_binary_chains tolerates (it truncates to whole segments).
        self._write_sidecar()

    def _write_sidecar(self) -> None:
        meta = {"num_chains": self.num_chains, "dim": self.dim,
                "dtype": "float32", "segments": self._segments}
        tmp = self.path + ".meta.json.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(meta, f)
        os.replace(tmp, self.path + ".meta.json")

    def close(self) -> None:
        if self._w is not None:
            self._w.close()
            self._w = None
            self._write_sidecar()


def read_binary_chains(path: str) -> np.ndarray:
    """Load a ``(C, T, d)`` chain history written by the native all-chain
    binary sink (``ChainWriter(..., chains='all', use_native=True)``)."""
    with open(path + ".meta.json", encoding="utf-8") as f:
        meta = json.load(f)
    C, d = meta["num_chains"], meta["dim"]
    raw = np.fromfile(path, dtype=np.float32)
    blocks = []
    off = 0
    for S in meta["segments"]:
        n = C * S * d
        if off + n > raw.size:
            # Crash-tolerant read: the sidecar is persisted per block while
            # the async writer may still hold the final payload in flight —
            # return the whole segments that actually reached disk.
            break
        blocks.append(raw[off:off + n].reshape(C, S, d))
        off += n
    assert blocks, "binary chain file holds no complete segment"
    return np.concatenate(blocks, axis=1)


class ChainWriter:
    """Streams (C, S, d) chain segments to one CSV per recorded chain.

    For ``chains=None`` only chain 0 is written (single-file, reference CSV
    format: one row per iteration).  Pass ``chains='all'`` to write
    ``<stem>_chain<k>.csv`` for every chain, or an iterable of indices.
    """

    def __init__(self, filelocation: str, chains=None, use_native: bool = False):
        """``use_native=True`` routes IO through the C++ asynchronous writer
        (``glabc_tpu.native``): formatting + disk IO run on a background
        thread so segment handoff never blocks the device loop.  With
        ``chains=None`` it writes the reference-format CSV for chain 0; with
        ``chains='all'`` it writes ONE binary file of raw float32 ``(C,S,d)``
        blocks plus a ``.meta.json`` sidecar (load with
        :func:`read_binary_chains`) — one file and one writer thread
        regardless of chain count.  Falls back silently to the Python csv
        writer if the native library cannot be built."""
        self.filelocation = filelocation
        self.chains = chains
        self._files = {}
        self._native = None
        self._native_cls = None
        self._native_multi = use_native and chains == "all"
        if use_native and (chains is None or chains == "all"):
            try:
                from ..native import NativeChainWriter, native_available
                if native_available():
                    self._native_cls = NativeChainWriter
            except ImportError:
                pass
        if self._native_cls is None:
            self._native_multi = False

    def _path(self, chain_idx: int) -> str:
        if self.chains is None:
            return self.filelocation
        stem, ext = os.path.splitext(self.filelocation)
        return f"{stem}_chain{chain_idx}{ext or '.csv'}"

    def _indices(self, num_chains: int):
        if self.chains is None:
            return [0]
        if self.chains == "all":
            return list(range(num_chains))
        return list(self.chains)

    def write_initial(self, theta0: np.ndarray) -> None:
        """Write the initial theta row(s).  ``theta0``: (C, d)."""
        theta0 = np.atleast_2d(np.asarray(theta0))
        if self._native_multi:
            self._native = _NativeMultiChainSink(
                self.filelocation, theta0.shape[0], theta0.shape[-1]
            )
            self._native.write_block(theta0[:, None, :].astype(np.float32))
            return
        if self._native_cls is not None:
            self._native = self._native_cls(self.filelocation,
                                            theta0.shape[-1])
            self._native.write(theta0[:1].astype(np.float32))
            return
        for ci in self._indices(theta0.shape[0]):
            with open(self._path(ci), "w", newline="", encoding="utf-8") as f:
                csv.writer(f).writerow(np.asarray(theta0[ci]).ravel())

    def on_segment(self, block: np.ndarray, start_index: int) -> None:
        """Append a (C, S, d) segment."""
        if self._native_multi and self._native is not None:
            self._native.write_block(np.asarray(block, dtype=np.float32))
            return
        if self._native is not None:
            self._native.write(np.asarray(block[0], dtype=np.float32))
            return
        for ci in self._indices(block.shape[0]):
            with open(self._path(ci), "a", newline="", encoding="utf-8") as f:
                w = csv.writer(f)
                w.writerows(np.asarray(block[ci]))

    def close(self) -> None:
        if self._native is not None:
            self._native.close()
            self._native = None


def carry_path(path: str) -> str:
    """Canonical on-disk name for a carry checkpoint (always ``.npz``).

    ``np.savez`` appends ``.npz`` when absent; normalizing once here keeps
    save/restore/exists probes agreeing on one name regardless of how the
    caller spelled the path."""
    return path if path.endswith(".npz") else path + ".npz"


def save_carry(path: str, carry: Any, step: int = 0) -> None:
    """Checkpoint a scan carry (any pytree) plus the step counter.

    The snapshot is written atomically (temp file + ``os.replace``) so a
    crash mid-write never destroys the previous checkpoint."""
    path = carry_path(path)
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__step__"] = np.asarray(step)
    tmp = path + ".tmp.npz"
    np.savez(tmp, treedef=np.frombuffer(pickle.dumps(treedef), dtype=np.uint8),
             **arrays)
    os.replace(tmp, path)


def load_carry(path: str):
    """Restore ``(carry, step)`` saved by :func:`save_carry`."""
    data = np.load(carry_path(path), allow_pickle=False)
    treedef = pickle.loads(data["treedef"].tobytes())
    n = len([k for k in data.files if k.startswith("leaf_")])
    # non-numeric leaves (e.g. config-name strings in checkpoint metadata)
    # stay numpy; numeric leaves come back as jax arrays
    leaves = [
        jax.numpy.asarray(leaf) if leaf.dtype.kind in "biufc" else leaf
        for leaf in (data[f"leaf_{i}"] for i in range(n))
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves), int(data["__step__"])
