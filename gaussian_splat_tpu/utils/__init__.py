"""Utilities: timing/metrics, kernel hot reload, structured logging."""
