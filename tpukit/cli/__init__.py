"""Command-line interfaces (runner, pipelines, figures, codec wrappers)."""
