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
