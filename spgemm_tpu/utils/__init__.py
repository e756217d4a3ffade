"""Timing, CSV sinks, roofline accounting."""
