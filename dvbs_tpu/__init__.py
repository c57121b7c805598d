"""dvbs_tpu — a TPU-native DVB-S / DVB-S2 receive framework.

A from-scratch reimplementation of the capabilities of
cropinghigh/sdrpp-dvbs-demodulator, architected for TPU:
frame/block-batched JAX + Pallas compute, feed-forward synchronization
anchored on the DVB-S2 physical-layer structure, and shard_map
channel/device parallelism — instead of the reference's per-sample C++
feedback loops.
"""

__version__ = "0.1.0"
