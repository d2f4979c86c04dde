"""Visualization and 3D export: raw-output strips, layout meshes, PLY."""
