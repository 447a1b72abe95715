"""Native (C++) runtime components, bound via ctypes.

The compute path is JAX/XLA/Pallas; the runtime around it — here, the
asynchronous chain-history sink — is native C++ so host IO never blocks the
device loop.  The shared library is compiled on first use (g++ available in
the image) and cached next to the source; everything degrades gracefully to
the pure-Python writers if no toolchain is present.
"""

from .writer import NativeChainWriter, native_available

__all__ = ["NativeChainWriter", "native_available"]
