"""CLI entry points mirroring the reference's five tools + dataset prep.

Run as modules, e.g. ``python -m horizonnet_tpu.cli.inference --pth ...``.
Flag names and output formats match the reference (SURVEY.md §5 config).
"""
