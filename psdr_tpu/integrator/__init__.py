from .base import Integrator
from .field import FieldExtractionIntegrator
from .direct import DirectIntegrator
from .path import PathTracer
