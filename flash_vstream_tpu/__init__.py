"""flash_vstream_tpu: TPU-native streaming video understanding framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of IVGSZ/Flash-VStream:
streaming video VLMs whose frames are consolidated into a fixed-size memory
(clustering + pooling + retrieval) injected into an LLM context, enabling
bounded-latency question answering over arbitrarily long streams.
"""

__version__ = "0.1.0"
