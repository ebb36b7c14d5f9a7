from .scene import Scene, FlatScene, ray_intersect, scene_le, \
    sample_emitter_position, emitter_position_pdf, sample_boundary_segment_direct
from .loader import load_file, load_string, load_integrator
