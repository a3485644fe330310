"""Experiments kept for the record, NOT on any production path.

Each module documents the measurement that demoted it; the op-surface /
kernel-parity claims in PARITY.md rest solely on the measured production
paths (ops/, search/), never on anything here.
"""
