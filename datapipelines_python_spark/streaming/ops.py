"""Placeholder — streaming operators land in M5."""
