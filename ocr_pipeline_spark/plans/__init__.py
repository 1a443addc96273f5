"""End-to-end job assembly (scan → salt → extract → sink + manifests)."""
