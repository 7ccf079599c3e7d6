"""Numpy-based parameter initialization schemes.

Config-driven (re-)initialization mirrors the reference's scheme registry
(``blocks/initialization.py``; configs instantiate these via YAML tags, e.g.
``exp/wsj/configs/wsj_paper.yaml``).  They are numpy-based because the
config-driven per-path initialization pass
(:func:`attention_lvcsr_tpu.models.recognizer.initialize_params`) runs on the
host once, before parameters are put on device.
"""
from __future__ import annotations

import numpy as np


class NdarrayInitialization:
    """Base class: generate a numpy array of a given shape."""

    def generate(self, rng: np.random.RandomState, shape):
        raise NotImplementedError

    def __repr__(self):
        args = ", ".join(f"{k}={v!r}" for k, v in sorted(self.__dict__.items()))
        return f"{type(self).__name__}({args})"

    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__


class Constant(NdarrayInitialization):
    def __init__(self, constant=0.0):
        self.constant = constant

    def generate(self, rng, shape):
        return np.full(shape, self.constant, dtype=np.float32)


class IsotropicGaussian(NdarrayInitialization):
    def __init__(self, std=1.0, mean=0.0):
        self.std = std
        self.mean = mean

    def generate(self, rng, shape):
        return rng.normal(self.mean, self.std, size=shape).astype(np.float32)


class Uniform(NdarrayInitialization):
    def __init__(self, mean=0.0, width=None, std=None):
        if (width is None) == (std is None):
            raise ValueError("provide exactly one of width or std")
        self.mean = mean
        self.width = width
        self.std = std

    def generate(self, rng, shape):
        w = self.width if self.width is not None else np.sqrt(12) * self.std
        return rng.uniform(self.mean - w / 2, self.mean + w / 2,
                           size=shape).astype(np.float32)


class Orthogonal(NdarrayInitialization):
    """Orthogonal init for square (or stacked-square) recurrent matrices."""

    def __init__(self, scale=1.0):
        self.scale = scale

    def generate(self, rng, shape):
        if len(shape) != 2:
            raise ValueError("orthogonal init needs a 2D shape")
        rows, cols = shape
        if cols % rows == 0:
            # e.g. state_to_gates (dim, 2*dim): independent orthogonal blocks.
            blocks = []
            for _ in range(cols // rows):
                m = rng.randn(rows, rows)
                q, r = np.linalg.qr(m)
                q = q * np.sign(np.diag(r))
                blocks.append(q)
            w = np.concatenate(blocks, axis=1)
        else:
            m = rng.randn(rows, cols)
            u, _, vt = np.linalg.svd(m, full_matrices=False)
            w = u if u.shape == shape else vt
        return (self.scale * w).astype(np.float32)


class Identity(NdarrayInitialization):
    def __init__(self, mult=1.0):
        self.mult = mult

    def generate(self, rng, shape):
        rows, cols = shape
        return (self.mult * np.eye(rows, cols)).astype(np.float32)


class Sparse(NdarrayInitialization):
    """Sparse init: a fraction of entries drawn from `weights_init`, rest 0."""

    def __init__(self, proportion=0.1, weights_init=None):
        self.proportion = proportion
        self.weights_init = weights_init or IsotropicGaussian(1.0)

    def generate(self, rng, shape):
        weights = np.zeros(shape, dtype=np.float32)
        flat = weights.reshape(-1)
        num = int(round(flat.size * self.proportion))
        idx = rng.choice(flat.size, num, replace=False)
        flat[idx] = self.weights_init.generate(rng, (num,))
        return weights


REGISTRY = {
    "constant": Constant,
    "isotropic_gaussian": IsotropicGaussian,
    "gaussian": IsotropicGaussian,
    "uniform": Uniform,
    "orthogonal": Orthogonal,
    "identity": Identity,
    "sparse": Sparse,
}

# Class-name aliases so reference YAML tags
# (!!python/object/apply:blocks.initialization.IsotropicGaussian) resolve.
REGISTRY.update({
    "Constant": Constant,
    "IsotropicGaussian": IsotropicGaussian,
    "Uniform": Uniform,
    "Orthogonal": Orthogonal,
    "Identity": Identity,
    "Sparse": Sparse,
})


def get_initializer(spec):
    """Resolve an initializer from an instance, name, or (name, args) spec."""
    if isinstance(spec, NdarrayInitialization):
        return spec
    if isinstance(spec, str):
        return REGISTRY[spec]()
    if isinstance(spec, (list, tuple)) and spec and isinstance(spec[0], str):
        return REGISTRY[spec[0]](*spec[1:])
    if isinstance(spec, dict) and "type" in spec:
        kwargs = {k: v for k, v in spec.items() if k != "type"}
        return REGISTRY[spec["type"]](**kwargs)
    raise ValueError(f"cannot interpret initializer spec: {spec!r}")
