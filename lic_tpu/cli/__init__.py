"""Command-line entry points (L5): train / eval / compress drivers."""
