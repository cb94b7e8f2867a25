"""Offline tooling: anchor search, dataset builders, benchmark harnesses,
robotics consumers — the re-based Tools/ + agent_controller/ layer of the
reference."""
