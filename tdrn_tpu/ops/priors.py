"""Prior (anchor) box generation.

TPU-native re-design of the reference's ``layers/functions/prior_box.py``
(SURVEY.md §2 #5, §3.5). The reference builds priors with a host-side Python
double loop over feature-map cells; here generation is fully vectorized numpy so
it can run once at setup and be closed over as a traced constant inside the
jitted program (BASELINE.json north-star: "prior-box generation ... on-device").

Geometry (RefineDet-style):
  cx = (j + 0.5) * step / size,  cy = (i + 0.5) * step / size
  per cell: [s, s] for s = min_size/size, then for each aspect ratio r:
            [s*sqrt(r), s/sqrt(r)] and [s/sqrt(r), s*sqrt(r)]
Output is (num_priors, 4) cxcywh in [0, 1], optionally clipped.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from tdrn_tpu.config import DetectorConfig


@functools.lru_cache(maxsize=None)
def prior_boxes_np(cfg: DetectorConfig) -> np.ndarray:
    """Generate priors as a host numpy array (float32, (num_priors, 4) cxcywh)."""
    outs = []
    for k, f in enumerate(cfg.feature_maps):
        step = cfg.steps[k]
        s = cfg.min_sizes[k] / cfg.size
        # Cell centers, vectorized over the f×f grid (row-major: i outer, j inner
        # to match the reference's itertools.product(range(f), repeat=2) order).
        ij = np.arange(f, dtype=np.float32)
        cy, cx = np.meshgrid(ij, ij, indexing="ij")
        cx = (cx + 0.5) * step / cfg.size
        cy = (cy + 0.5) * step / cfg.size
        centers = np.stack([cx, cy], axis=-1).reshape(-1, 2)  # (f*f, 2)

        whs = [(s, s)]
        for r in cfg.aspect_ratios[k]:
            rt = float(np.sqrt(r))
            whs.append((s * rt, s / rt))
            whs.append((s / rt, s * rt))
        whs = np.asarray(whs, dtype=np.float32)  # (A, 2)

        a = whs.shape[0]
        cells = np.repeat(centers, a, axis=0)  # (f*f*A, 2)
        sizes = np.tile(whs, (centers.shape[0], 1))  # (f*f*A, 2)
        outs.append(np.concatenate([cells, sizes], axis=-1))
    priors = np.concatenate(outs, axis=0).astype(np.float32)
    if cfg.clip:
        priors = np.clip(priors, 0.0, 1.0)
    assert priors.shape == (cfg.num_priors, 4), priors.shape
    return priors


def prior_boxes(cfg: DetectorConfig) -> jnp.ndarray:
    """Device-ready priors. Only the numpy generation is cached: the jnp
    conversion must happen per call site — caching a jnp array created inside
    a jit trace would leak a tracer into later traces (device_put is itself a
    traced primitive). Inside jit the conversion folds into a compile-time
    constant anyway."""
    return jnp.asarray(prior_boxes_np(cfg))
