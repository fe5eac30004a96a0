"""Problem-family definitions mirroring the reference examples 01-08."""
