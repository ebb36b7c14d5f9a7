from .area import AreaLight
from .envmap import EnvironmentMap
