from .io import ChainWriter, load_carry, save_carry

__all__ = ["ChainWriter", "load_carry", "save_carry"]
