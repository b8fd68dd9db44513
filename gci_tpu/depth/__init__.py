from .accum import (
    GenomeLayout,
    accumulate_depth,
    accumulate_depth_numpy,
    depth_dict_from_flat,
)

__all__ = [
    "GenomeLayout",
    "accumulate_depth",
    "accumulate_depth_numpy",
    "depth_dict_from_flat",
]
