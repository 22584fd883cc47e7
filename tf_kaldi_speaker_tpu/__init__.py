"""tf_kaldi_speaker_tpu — a TPU-native speaker-verification (x-vector) framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
mycrazycracy/tf-kaldi-speaker (reference layout documented in SURVEY.md):

- ``kio``      Kaldi ark/scp binary codec (vectorized numpy + optional C++ core)
- ``data``     host-side sampler & prefetching input pipeline
- ``models``   TDNN x-vector network + pooling zoo (flax)
- ``losses``   softmax / A-softmax / AM-softmax / AAM-softmax / triplet / GE2E
- ``ops``      Pallas TPU kernels and on-device DSP (CMVN, VAD)
- ``parallel`` device-mesh utilities (DP over ICI, sharded softmax)
- ``train``    pjit trainer, schedules, checkpointing
- ``extract``  batched TPU embedding extraction
- ``backend``  scoring: cosine / LDA / PLDA, EER / minDCF / DET
- ``utils``    JSON Params config system & experiment bookkeeping
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # An explicit JAX_PLATFORMS env var is caller intent (test conftest,
    # CLI subprocesses spawned by e2e tests, CPU-mesh dry runs). Some
    # environments install a sitecustomize that re-pins
    # jax.config.jax_platforms to the local accelerator in EVERY python
    # process, which silently overrides the env var and can then block
    # at first backend init when that accelerator is unreachable.
    # Re-assert the env var before any backend in this process
    # initializes (importing this package precedes any jax.devices()
    # call in all our entry points).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - config rename safety net
        pass
