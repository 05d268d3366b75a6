"""Distributed execution: device meshes, sharded batches, result merge."""
