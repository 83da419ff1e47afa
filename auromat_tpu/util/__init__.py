"""Small host-side utilities (downloads, filesystem, coroutines)."""
