from .mesh import make_mesh, pad_to_multiple

__all__ = ["make_mesh", "pad_to_multiple"]
