"""ChatTS-TPU: a TPU-native (JAX/XLA/Pallas) Time-Series Multimodal LLM framework.

Re-designed from scratch with the capabilities of NetManAIOps/ChatTS
(time-series patch encoder + Qwen2/Qwen3 decoder, value-preserved TS encoding,
synthetic datagen, eval harness, and a continuous-batching serving runtime).
"""

__version__ = "0.1.0"
