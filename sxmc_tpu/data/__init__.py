"""Shipped data files (autotune verdicts recorded on real hardware)."""
