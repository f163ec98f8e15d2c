from .checkpoint import CheckpointedRun, run_with_checkpoints

__all__ = ["CheckpointedRun", "run_with_checkpoints"]
