from .base import Integrator
from .field import FieldExtractionIntegrator
from .direct import DirectIntegrator
