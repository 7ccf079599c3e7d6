"""Training services: loop, extensions, monitoring, rules, checkpoints."""
