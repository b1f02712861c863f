from .ply import read_ply, write_ply
from .pfm import read_pfm, write_pfm

__all__ = ["read_ply", "write_ply", "read_pfm", "write_pfm"]
