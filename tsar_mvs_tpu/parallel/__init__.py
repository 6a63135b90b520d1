"""Multi-chip distribution: view-axis sharding over a device mesh."""
