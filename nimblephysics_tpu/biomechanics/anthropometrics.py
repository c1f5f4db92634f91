"""Anthropometric priors — `dart/biomechanics/Anthropometrics` (650 LoC).

A Gaussian prior over named body-scale dimensions (built from population
datasets like ANSUR); its log-PDF regularizes the marker/dynamics fitters.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.ops.stats import MultivariateGaussian


@dataclasses.dataclass(frozen=True)
class Anthropometrics:
    """gaussian over a vector of scale metrics; metrics[i] = (body_index,
    axis) picks scales[body, axis] as variable i."""

    metrics: Tuple[Tuple[int, int], ...]
    gaussian: MultivariateGaussian

    @staticmethod
    def from_moments(metrics, mean, cov) -> "Anthropometrics":
        return Anthropometrics(
            metrics=tuple((int(b), int(a)) for b, a in metrics),
            gaussian=MultivariateGaussian(jnp.asarray(mean), jnp.asarray(cov)),
        )

    def extract(self, scales: jax.Array) -> jax.Array:
        return jnp.stack([scales[b, a] for b, a in self.metrics])

    def log_pdf(self, scales: jax.Array) -> jax.Array:
        return self.gaussian.logpdf(self.extract(scales))

    def condition_on(self, observed: Dict[int, float]) -> "Anthropometrics":
        """Condition the prior on known measurements (metric index ->
        value), e.g. subject height/weight (`Anthropometrics::condition`)."""
        idx = sorted(observed)
        values = jnp.asarray([observed[i] for i in idx])
        g2 = self.gaussian.condition(idx, values)
        remaining = tuple(
            m for i, m in enumerate(self.metrics) if i not in set(idx)
        )
        return Anthropometrics(metrics=remaining, gaussian=g2)
