from .io import ChainWriter, load_carry, save_carry
from .profiling import annotate, debug_mode, trace

__all__ = ["ChainWriter", "load_carry", "save_carry", "annotate",
           "debug_mode", "trace"]
