"""Receive pipelines ("model families"): DVB-S and DVB-S2 demodulators."""
