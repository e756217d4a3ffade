"""Compute ops: symbolic + numeric SpGEMM, golden references, SpMV/SpMM."""
