"""Host-side utilities: transfers, seeding, serialization, experiments."""
