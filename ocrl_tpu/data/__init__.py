from .hdf5 import H5Dataset, DataLoader, get_dataloaders
from .prefetch import prefetch_to_device

__all__ = ["H5Dataset", "DataLoader", "get_dataloaders", "prefetch_to_device"]
