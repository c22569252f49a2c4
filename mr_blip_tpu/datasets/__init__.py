"""Data layer: annotation datasets, video decode, frame sampling, loaders."""
