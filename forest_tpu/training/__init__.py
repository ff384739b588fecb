"""Training orchestration: steps, loops, schedulers, annealers, checkpoints."""
