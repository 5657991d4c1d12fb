"""Host utilities: flow/image I/O, visualization, logging."""
