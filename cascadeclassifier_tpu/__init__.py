"""cascadeclassifier_tpu — a TPU-native Viola–Jones cascade framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
OpenCV ``opencv_traincascade`` suite (vladiant/CascadeClassifier):

- batched integral-image kernels (sum / squared-sum / tilted)
- vectorized Haar / LBP / HOG feature catalogs and evaluators
- a dense multi-scale sliding-window detector with survivor compaction
- a GAB/DAB/RAB/LB boosted-cascade trainer built on sort-based exact
  weighted split search (vectorized over the whole feature axis)
- OpenCV-compatible cascade.xml / params.xml / stageN.xml round-trip I/O
- sample tooling (.vec read/write, background mining, sample synthesis)
- multi-chip scaling via jax.sharding (feature-sharded split search,
  window/batch data parallelism)

The compute path is pure JAX (jit/pjit/shard_map + Pallas); host-side IO has
a native C++ companion library (csrc/) with a Python fallback.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# persistent compilation cache: detector/trainer programs are large and the
# environment's remote AOT compiles are slow — cache across processes.
if not _os.environ.get("CCTPU_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/cascadeclassifier_tpu/jax"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from cascadeclassifier_tpu.models.model import (  # noqa: F401
    CascadeModel,
    Stage,
    WeakTree,
    HaarFeature,
    LBPFeature,
    HOGFeature,
)
