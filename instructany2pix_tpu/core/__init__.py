from . import checkpoint, config, dtypes, mesh, prng, tree
from .config import instantiate_from_config
from .dtypes import DTypePolicy
from .mesh import make_mesh, single_device_mesh, use_mesh
from .prng import KeyChain

__all__ = [
    "checkpoint",
    "config",
    "dtypes",
    "mesh",
    "prng",
    "tree",
    "instantiate_from_config",
    "DTypePolicy",
    "make_mesh",
    "single_device_mesh",
    "use_mesh",
    "KeyChain",
]
