from . import constants, math, frame, warp, transform, sampler, distribution, bitmap, records
