"""Host-side utilities: visualization/export, parameter checkpoints."""
