"""Core facade: config, serialization, experiment management."""
