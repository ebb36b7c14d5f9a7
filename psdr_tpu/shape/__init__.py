from .mesh import Mesh, load_obj, build_edges, TriangleInfo, SecondaryEdgeInfo
from . import primitives
