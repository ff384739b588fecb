"""FRL training orchestration subpackage (step, loops, curricula, logging)."""
