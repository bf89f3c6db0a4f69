"""Engine operators: normalization, star build, and scale extensions."""
