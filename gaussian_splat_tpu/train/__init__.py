"""Training: photometric losses, optimizer wiring, checkpointing."""
