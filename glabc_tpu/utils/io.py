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
import os
import pickle
from typing import Any

import jax
import numpy as np

__all__ = ["ChainWriter", "save_carry", "load_carry"]


class ChainWriter:
    """Streams (C, S, d) chain segments to one CSV per recorded chain.

    For ``chains=None`` only chain 0 is written (single-file, reference CSV
    format: one row per iteration).  Pass ``chains='all'`` to write
    ``<stem>_chain<k>.csv`` for every chain, or an iterable of indices.
    """

    def __init__(self, filelocation: str, chains=None, use_native: bool = False):
        """``use_native=True`` routes single-file mode through the C++
        asynchronous writer (``glabc_tpu.native``): formatting + disk IO run
        on a background thread so segment handoff never blocks the device
        loop.  Falls back silently to the Python csv writer if the native
        library cannot be built."""
        self.filelocation = filelocation
        self.chains = chains
        self._files = {}
        self._native = None
        if use_native and chains is None:
            try:
                from ..native import NativeChainWriter, native_available
                if native_available():
                    self._native_cls = NativeChainWriter
                else:
                    self._native_cls = None
            except ImportError:
                self._native_cls = None
        else:
            self._native_cls = None

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


def save_carry(path: str, carry: Any, step: int = 0) -> None:
    """Checkpoint a scan carry (any pytree) plus the step counter."""
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__step__"] = np.asarray(step)
    np.savez(path, treedef=np.frombuffer(pickle.dumps(treedef), dtype=np.uint8),
             **arrays)


def load_carry(path: str):
    """Restore ``(carry, step)`` saved by :func:`save_carry`."""
    data = np.load(path, allow_pickle=False)
    treedef = pickle.loads(data["treedef"].tobytes())
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves), int(data["__step__"])
