from .perspective import PerspectiveCamera, SensorState, configure_sensor, \
    sample_primary_ray, sample_direct, sample_primary_edge
