"""Inverse-rendering optimization utilities.

Parity reference: psdr-cuda examples/utils/adam.py (Adam over bitmap data /
vertex positions via Enoki gradient re-attachment) — here a thin layer over
optax operating on the scene's parameter pytree, with param_map-style
string addressing to choose which leaves optimize ("BSDF[id=white].reflectance",
"Mesh[0].vertex_positions", ...). Everything composes with jit/grad and the
multi-chip train step in psdr_tpu.parallel.
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp

from .scene.scene import Scene


_GROUP_OF = {"Mesh": "meshes", "BSDF": "bsdfs", "Emitter": "emitters",
             "Sensor": "sensors"}


def resolve_param_path(scene: Scene, path: str):
    """'BSDF[id=white].reflectance' -> ('bsdfs', index, 'reflectance')."""
    key, _, leaf = path.partition(".")
    if key not in scene.param_map:
        raise KeyError(f"Unknown param_map key '{key}' "
                       f"(have: {sorted(scene.param_map)})")
    obj = scene.param_map[key]
    kind = key.split("[")[0]
    group = _GROUP_OF[kind]
    objs = getattr(scene, group)
    index = next(i for i, o in enumerate(objs) if o is obj)
    if leaf:
        if leaf not in obj.params():
            raise KeyError(f"'{key}' has no parameter '{leaf}' "
                           f"(have: {sorted(obj.params())})")
        return group, index, leaf
    return group, index, None


def param_mask(scene: Scene, paths: Iterable[str]):
    """Boolean mask pytree: True on leaves selected by ``paths``."""
    selected = [resolve_param_path(scene, p) for p in paths]
    params = scene.params()

    def mask_leaf(group, index, leaf_name):
        return any(g == group and i == index and (l is None or l == leaf_name)
                   for g, i, l in selected)

    return {
        group: [
            {name: mask_leaf(group, i, name) for name in entry}
            for i, entry in enumerate(params[group])
        ]
        for group in params
    }


class Optimizer:
    """Adam over selected scene parameters (masked optax chain).

    >>> opt = Optimizer(scene, ["BSDF[id=white].reflectance"], lr=2e-2)
    >>> loss = opt.step(loss_fn)         # loss_fn(params) -> scalar
    """

    def __init__(self, scene: Scene, paths: Iterable[str], lr: float = 1e-2,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
        import optax
        self.scene = scene
        mask = param_mask(scene, paths)
        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        self.tx = optax.multi_transform(
            {"train": optax.adam(lr, b1=b1, b2=b2, eps=eps),
             "freeze": optax.set_to_zero()}, labels)
        self.params = scene.params()
        self.state = self.tx.init(self.params)
        self._jit_update = jax.jit(self._update)

    def _update(self, params, grads, state):
        import optax
        updates, state = self.tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    def step(self, loss_fn: Callable, *args) -> float:
        loss, grads = jax.value_and_grad(loss_fn)(self.params, *args)
        self.params, self.state = self._jit_update(self.params, grads,
                                                   self.state)
        return float(loss)

    def maybe_rebuild_accel(self, threshold: float = 1.5) -> bool:
        """Re-sort the acceleration topology if geometry optimization has
        degraded the frozen Morton order (scene.refit_quality). Call every
        few steps when optimizing vertex positions; triggers a one-time
        retrace of jitted renders."""
        return self.scene.maybe_rebuild_accel(self.params,
                                              threshold=threshold)

    def write_back(self) -> None:
        """Push optimized parameters into the host scene objects."""
        self.scene.set_params(self.params)

    # -- checkpoint / resume (SURVEY.md §5.4: absent in the reference) ------
    def save(self, path: str) -> None:
        """Checkpoint parameters + optimizer state to an .npz file."""
        import numpy as np
        leaves, treedef = jax.tree.flatten((self.params, self.state))
        np.savez(path, n=len(leaves),
                 **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})

    def load(self, path: str) -> None:
        """Resume from a checkpoint written by :meth:`save` (the scene /
        optimizer configuration must match)."""
        import numpy as np
        data = np.load(path)
        leaves, treedef = jax.tree.flatten((self.params, self.state))
        assert int(data["n"]) == len(leaves), "checkpoint structure mismatch"
        new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
        self.params, self.state = jax.tree.unflatten(treedef, new_leaves)
