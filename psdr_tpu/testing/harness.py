"""AD-vs-FD validation harness.

Parity reference: psdr-cuda examples/run_test.py —
* ``run_orig`` (run_test.py:12-41): npass-averaged forward render;
* ``run_ad`` (run_test.py:44-147): forward-mode (jvp) derivative image
  d(image)/dP at P=0 through scene rebuild + renderD (interior + boundary
  terms), with optional secondary-edge guiding preprocess;
* ``run_fd`` (run_test.py:150-231): central finite differences from two
  perturbed scenes at +-eps.

Derivative images are the reference's own correctness standard (SURVEY.md
section 4): AD and FD images must agree.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sampler import make_streams
from .differential import apply_perturbation


def _render_avg(render, params, npass: int, seed0: int = 0) -> np.ndarray:
    acc = None
    for i in range(npass):
        img = render(params, jax.random.PRNGKey(seed0 + i))
        acc = img if acc is None else acc + img
    return np.asarray(acc / npass)


def run_orig(scene, integrator, npass: int = 1, sensor_id: int = 0) -> np.ndarray:
    """npass-averaged forward render -> (H, W, 3)."""
    render = jax.jit(integrator.render_fn(scene, sensor_id,
                                          with_boundary=False))
    img = _render_avg(render, scene.params(), npass)
    return img.reshape(scene.opts.height, scene.opts.width, 3)


def run_ad(scene, integrator, perturbation: str, npass: int = 1,
           sensor_id: int = 0, guiding: Optional[tuple] = None,
           seed0: int = 1000, **pkwargs) -> np.ndarray:
    """Forward-mode derivative image d(image)/dP at P=0 -> (H, W, 3).

    ``guiding``: optional (reso, nrounds) to build the secondary-edge
    guiding distribution first (run_test.py:121-124).
    """
    if guiding is not None and hasattr(integrator, "preprocess_secondary_edges"):
        integrator.preprocess_secondary_edges(scene, sensor_id, guiding[0],
                                              guiding[1])
    render = integrator.render_fn(scene, sensor_id, with_boundary=True)
    base = scene.params()

    def image_of(P, key):
        return render(apply_perturbation(perturbation, base, P, **pkwargs),
                      key)

    @jax.jit
    def deriv(key):
        _, dimg = jax.jvp(lambda P: image_of(P, key),
                          (jnp.float32(0.0),), (jnp.float32(1.0),))
        return dimg

    acc = None
    for i in range(npass):
        d = deriv(jax.random.PRNGKey(seed0 + i))
        acc = d if acc is None else acc + d
    return np.asarray(acc / npass).reshape(scene.opts.height,
                                           scene.opts.width, 3)


def run_fd(scene, integrator, perturbation: str, eps: float = 0.01,
           npass: int = 8, sensor_id: int = 0, seed0: int = 0,
           **pkwargs) -> np.ndarray:
    """Central-difference derivative image -> (H, W, 3). Uses common random
    numbers (same keys at +-eps) for variance reduction, like the
    reference's paired scene renders (run_test.py:150-231)."""
    render = jax.jit(integrator.render_fn(scene, sensor_id,
                                          with_boundary=False))
    base = scene.params()

    acc = None
    for i in range(npass):
        key = jax.random.PRNGKey(seed0 + i)
        hi = render(apply_perturbation(perturbation, base, +eps, **pkwargs), key)
        lo = render(apply_perturbation(perturbation, base, -eps, **pkwargs), key)
        d = (hi - lo) / (2.0 * eps)
        acc = d if acc is None else acc + d
    return np.asarray(acc / npass).reshape(scene.opts.height,
                                           scene.opts.width, 3)
