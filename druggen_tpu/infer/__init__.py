"""Inference subsystem: generator sampling loop + metric report + SMILES
correction."""
