"""rtts — a TPU-native Reformer-TTS framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``kowaalczyk/reformer-tts`` pipeline (see SURVEY.md): a Reformer-based
text-to-mel acoustic model (shared-QK LSH attention, reversible residuals,
chunked feed-forward), a SqueezeWave normalizing-flow vocoder, a jitted audio
front-end (STFT + mel filterbank), a text frontend, and a training/inference
harness — all designed TPU-first (SPMD meshes, functional transforms, static
shapes, Pallas kernels on the hot paths).
"""

__version__ = "0.1.0"
