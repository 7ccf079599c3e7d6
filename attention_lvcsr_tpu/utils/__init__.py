"""Small utilities shared across the framework."""
