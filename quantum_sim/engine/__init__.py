"""Engine facade — pure compute layer, no GUI dependencies."""
