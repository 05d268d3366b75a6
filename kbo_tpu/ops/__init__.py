"""Core pipeline operations (host reference implementations + device paths)."""
