"""`dcomp` command-line driver (python -m dctpu.cli.main)."""
