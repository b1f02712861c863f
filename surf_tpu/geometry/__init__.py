from .mesh import Mesh
from .marching_cubes import marching_cubes
from .clean_mesh import clean_mesh, clean_mesh_by_mask, clean_mesh_outside_frustum
from .extract import extract_geometry

__all__ = ["Mesh", "marching_cubes", "extract_geometry", "clean_mesh", "clean_mesh_by_mask",
           "clean_mesh_outside_frustum"]
