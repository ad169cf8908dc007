"""Training subsystem: WGAN-GP losses, the single-jit train step, trainer
orchestration, checkpointing."""
